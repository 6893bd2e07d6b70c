"""Class palette / color mapping (G26 — presentation edge, not an engine op).

Parity with /root/reference/robosat/colors.py:45-95: named class colors and
a continuous HSV saturation ramp for probability visualization. Pure
functions usable driver-side or inside export UDFs.
"""

from __future__ import annotations

import colorsys

# name -> RGB, the reference's Tableau-ish palette subset it uses for masks
COLORS = {
    "white": (255, 255, 255),
    "denim": (48, 96, 176),
    "orange": (255, 127, 14),
    "green": (44, 160, 44),
    "red": (214, 39, 40),
    "purple": (148, 103, 189),
    "grey": (127, 127, 127),
    "pink": (227, 119, 194),
}


def class_palette(class_colors: list[str]) -> list[int]:
    """Class index -> flat palette list [r0,g0,b0, r1,g1,b1, ...] (the
    P-mode PNG palette layout the reference writes)."""
    flat: list[int] = []
    for name in class_colors:
        flat.extend(COLORS[name])
    return flat


def continuous_palette_for_color(name: str, bins: int = 256) -> list[int]:
    """Saturation ramp of one base color across ``bins`` entries — the
    probability-raster palette. Bit-parity with colors.py:70-95: the ramp
    targets FULL saturation ((i+1)/bins, ignoring the base color's own s)
    and truncates with int(), exactly like the reference."""
    r, g, b = (v / 255.0 for v in COLORS[name])
    h, _s, v = colorsys.rgb_to_hsv(r, g, b)
    flat: list[int] = []
    for i in range(bins):
        ns = (1.0 / bins) * (i + 1)
        flat.extend(int(c * 255) for c in colorsys.hsv_to_rgb(h, ns, v))
    return flat
