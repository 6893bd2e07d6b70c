"""Minimal from-scratch PNG codec (stdlib zlib/struct + NumPy only).

Un-stubs the K4 slippy PNG sink and the multimodal decode path: the
reference writes palette PNG masks (robosat/tools/rasterize.py:126-140 via
PIL) and reads slippy-map PNGs (robosat/tiles.py:65-100); this environment
has no PIL/cv2, but PNG itself is just zlib-compressed filtered scanlines
in CRC-framed chunks — all stdlib.

Supported (everything the tile pipeline needs):
- encode: 8-bit grayscale (color type 0), RGB (2), palette (3, with PLTE)
- decode: 8-bit gray / RGB / RGBA / palette, all five scanline filters
  (None/Sub/Up/Average/Paeth), non-interlaced

Not supported (raise ValueError): 16-bit depths, interlace, ancillary
color-management chunks are ignored.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(
    img: np.ndarray, palette: list[int] | None = None, level: int = 6
) -> bytes:
    """uint8 array -> PNG bytes.

    (H, W) + palette -> color type 3 (palette-indexed, the reference's mask
    format); (H, W) without palette -> grayscale; (H, W, 3) -> RGB.
    Scanlines use filter 0 (None) — masks are mostly constant runs, zlib
    eats them regardless."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    if a.ndim == 2:
        color_type = 3 if palette is not None else 0
        h, w = a.shape
        raw = a
    elif a.ndim == 3 and a.shape[2] == 3:
        if palette is not None:
            raise ValueError("palette only valid for 2-D index arrays")
        color_type = 2
        h, w = a.shape[:2]
        raw = a.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    scan = np.empty((h, raw.shape[1] + 1), dtype=np.uint8)
    scan[:, 0] = 0
    scan[:, 1:] = raw
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        p = bytes(palette)
        if len(p) % 3 or len(p) > 768:
            raise ValueError("palette must be a flat [r,g,b,...] list, <=256 entries")
        out.append(_chunk(b"PLTE", p))
    out.append(_chunk(b"IDAT", zlib.compress(scan.tobytes(), level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[np.ndarray, list[int] | None]:
    """PNG bytes -> (array, palette|None).

    Palette images return the INDEX array (H, W) plus the flat palette —
    the mask-pipeline contract (class indices, not colors). Gray -> (H, W),
    RGB/RGBA -> (H, W, C). EVERY malformed input raises ValueError
    (struct/zlib errors are wrapped), so callers need one except clause."""
    try:
        return _decode_png(data)
    except (struct.error, zlib.error) as e:
        raise ValueError(f"malformed PNG: {e}") from e


def _decode_png(data: bytes) -> tuple[np.ndarray, list[int] | None]:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    palette: list[int] | None = None
    idat = []
    while pos < len(data):
        if pos + 12 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated {tag!r} chunk")
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            palette = list(body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(f"unsupported PNG variant (interlace={interlace})")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    # sub-byte depths (1/2/4) appear for gray & palette only (PIL writes
    # binary masks as depth-1 palette PNGs — the reference's own goldens);
    # multi-channel types require depth 8
    if depth == 8:
        pass
    elif depth in (1, 2, 4) and color_type in (0, 3):
        pass
    else:
        raise ValueError(f"unsupported bit depth {depth} for color type {color_type}")
    raw = zlib.decompress(b"".join(idat))
    stride = (w * channels * depth + 7) // 8
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    # filters operate on BYTES; for sub-byte depths the left-neighbor
    # distance is one byte (PNG spec: bpp = max(1, channels*depth/8))
    bpp = max(1, channels * depth // 8)
    for y in range(h):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            rec = line
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — vectorized: per-bpp-offset cumsum mod 256
            rec = line.copy()
            for off in range(bpp):
                rec[off::bpp] = np.cumsum(line[off::bpp]) & 0xFF
        elif ftype == 3:  # Average — left-dependency forces a per-pixel loop
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                ul = int(out[y - 1, x - bpp]) if (y > 0 and x >= bpp) else 0
                rec[x] = (rec[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    if depth < 8:
        # unpack bit-packed samples (big-endian within each byte)
        bits = np.unpackbits(out, axis=1)[:, : w * depth]
        if depth == 1:
            samples = bits
        else:
            samples = np.zeros((h, w), dtype=np.uint8)
            for k in range(depth):
                samples = (samples << 1) | bits[:, k::depth]
        img = samples.reshape(h, w).astype(np.uint8)
    elif channels == 1:
        img = out.reshape(h, w)
    else:
        img = out.reshape(h, w, channels)
    return img, palette
