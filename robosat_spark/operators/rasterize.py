"""Rasterize: features + tile list -> per-tile uint8 mask grids (`rs rasterize`).

Reference behavior (/root/reference/robosat/tools/rasterize.py:100-140):
for each CSV tile, burn the mercator-projected polygons that cover it into
a size x size uint8 grid (zero grid when no features), with max-merge on
rerun collisions (:131-133).

Spark shape (J2 + G18 + A6): tiles LEFT OUTER JOIN cover(features) on the
tile key -> groupBy(z, x, y).applyInPandas(burn). The left-outer null group
produces the zero mask; burning every covering feature onto one canvas in
the group is the max-merge. Ring coordinates ride a broadcast (the feature
table is the small side), so the shuffle moves only (tile, feature_id)
pairs.

The deterministic "predict" substitute (P1, SURVEY.md §2.4) is
``synthesize_probs``: exact burns plus seeded salt-and-pepper noise and
quantization (G19), so features/merge/dedupe are exercised end-to-end
without torch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels.geometry import as_ring
from ..kernels.mercator import lonlat_to_mercator, tile_xy_bounds
from ..kernels.raster import rasterize_rings

MASK_SCHEMA = "z INT, x LONG, y LONG, w INT, h INT, data BINARY"


def tile_transform(x: int, y: int, z: int, size: int):
    """world lon/lat -> pixel (col_f, row_f) via the tile's mercator bounds
    (the affine of /root/reference/robosat/tools/rasterize.py:75-77)."""
    left, bottom, right, top = tile_xy_bounds(x, y, z)
    sx = size / (right - left)
    sy = size / (top - bottom)

    def t(lon, lat):
        mx, my = lonlat_to_mercator(lon, lat)
        return (mx - left) * sx, (top - my) * sy

    return t


def rasterize_masks(
    spark: SparkSession,
    tiles_df: DataFrame,
    features: DataFrame,
    zoom: int,
    size: int = 512,
) -> DataFrame:
    """-> masks DataFrame(z, x, y, w, h, data) for every tile in tiles_df.

    Fully distributed: ring payloads join onto the (tile, feature) cover
    rows (no driver collection), so the feature side can be web-scale; the
    left-outer null group still yields the zero mask."""
    from .cover import cover

    cov = cover(features, zoom).select("x", "y", "feature_id").join(
        features.select("feature_id", "rings"), "feature_id"
    )
    tiles_norm = tiles_df.select(
        F.col("x").cast("long").alias("x"), F.col("y").cast("long").alias("y")
    ).distinct()
    # ship rings as JSON text through the grouped exchange: pyarrow's
    # grouped arrow_to_pandas segfaults on (nullable) deeply-nested list
    # columns in this environment, and per-tile ring counts are tiny so
    # the parse cost is noise
    joined = tiles_norm.join(cov, ["x", "y"], "left_outer").select(
        "x", "y", "feature_id", F.to_json(F.col("rings")).alias("rings_json")
    )

    def burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        import json

        x, y = int(key[0]), int(key[1])
        t = tile_transform(x, y, zoom, size)
        canvas = np.zeros((size, size), dtype=np.uint8)
        for fid, rj in zip(pdf["feature_id"], pdf["rings_json"]):
            if fid is None or (isinstance(fid, float) and np.isnan(fid)) or rj is None:
                continue
            np_rings = [as_ring(r) for r in json.loads(rj)]
            burned = rasterize_rings(np_rings, size, size, t)
            np.maximum(canvas, burned, out=canvas)  # A6 max-merge
        return pd.DataFrame(
            {"z": [np.int32(zoom)], "x": [x], "y": [y], "w": [size], "h": [size],
             "data": [canvas.tobytes()]}
        )

    return joined.groupBy("x", "y").applyInPandas(burn, MASK_SCHEMA)


def quantize_probs(prob: np.ndarray) -> np.ndarray:
    """float[0,1] -> uint8 (G19): np.digitize over 256 linspace anchors,
    parity with /root/reference/robosat/tools/predict.py:102-103."""
    anchors = np.linspace(0, 1, 256)
    return np.digitize(prob, anchors).astype(np.uint8)


def unquantize_probs(q: np.ndarray) -> np.ndarray:
    """uint8 -> float (G20): anchors[q], 2-channel stack (bg = 1 - fg),
    parity with /root/reference/robosat/tools/masks.py:41-55."""
    anchors = np.linspace(0, 1, 256)
    fg = anchors[np.clip(q.astype(np.int64), 0, 255)]
    return np.stack([1.0 - fg, fg])


def synthesize_probs(masks: DataFrame, noise: float = 0.02) -> DataFrame:
    """Deterministic predict substitute: mask burn -> fg prob 0.9/0.1 with
    seeded salt-and-pepper noise -> quantized uint8 (P1)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                grid = np.frombuffer(row["data"], dtype=np.uint8).reshape(row["h"], row["w"])
                rng = np.random.RandomState((row["x"] * 73856093 ^ row["y"] * 19349663) % (2**31))
                prob = np.where(grid > 0, 0.9, 0.1)
                flip = rng.rand(*grid.shape) < noise
                prob = np.where(flip, 1.0 - prob, prob)
                out.append((row["z"], row["x"], row["y"], row["w"], row["h"],
                            quantize_probs(prob).tobytes()))
            if out:
                yield pd.DataFrame(out, columns=["z", "x", "y", "w", "h", "data"])

    return masks.mapInPandas(gen, MASK_SCHEMA)


def probs_to_masks(probs: DataFrame, weights=(1.0, 1.0)) -> DataFrame:
    """Ensemble soft-vote argmax (G21/P2): unquantize -> weighted average ->
    argmax. Single-model case reduces to fg > 0.5."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                q = np.frombuffer(row["data"], dtype=np.uint8).reshape(row["h"], row["w"])
                stacked = unquantize_probs(q)
                mask = np.argmax(np.average(stacked[None, ...], axis=0, weights=[1.0]), axis=0)
                out.append((row["z"], row["x"], row["y"], row["w"], row["h"],
                            mask.astype(np.uint8).tobytes()))
            if out:
                yield pd.DataFrame(out, columns=["z", "x", "y", "w", "h", "data"])

    return probs.mapInPandas(gen, MASK_SCHEMA)


def mask_nonzero_pct(masks: DataFrame) -> DataFrame:
    """F9 helper: percent of non-zero pixels per tile (compare tool's
    masks_percentage, /root/reference/robosat/tools/compare.py:44-49)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                grid = np.frombuffer(row["data"], dtype=np.uint8)
                rows.append((row["z"], row["x"], row["y"],
                             float(np.count_nonzero(grid)) / grid.size * 100.0))
            if rows:
                yield pd.DataFrame(rows, columns=["z", "x", "y", "pct"])

    return masks.mapInPandas(gen, "z INT, x LONG, y LONG, pct DOUBLE")
