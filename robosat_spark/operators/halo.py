"""Tile-halo exchange (J6): compose each tile with its 8 neighbors.

Reference behavior (/root/reference/robosat/tiles.py:139-227 +
/root/reference/robosat/datasets.py:83-136): buffered prediction reads a
(size + 2*overlap)^2 window per tile, pasting the 8 adjacent tiles around
the center and nodata-filling missing neighbors; after inference the
overlap border is cropped back off (datasets.py:123-136).

Spark shape: the reference's per-tile random reads become one structured
join — tiles x 9 offsets, equi-join on the shifted key (O(9T) hash join,
not a theta join), then ``applyInPandas`` pastes the group into the halo
canvas. The same buffer-replicate trick handles any cross-tile-boundary
computation (feature merging, convolution) without a global shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HALO_SCHEMA = "z INT, x LONG, y LONG, w INT, h INT, data BINARY"


def stitch_halo(spark: SparkSession, masks: DataFrame, overlap: int = 32) -> DataFrame:
    """masks(z,x,y,w,h,data) -> same keys, (w+2*overlap, h+2*overlap) grids.

    Missing neighbors contribute zeros (nodata fill, tiles.py:200-207)."""
    offsets = spark.createDataFrame(
        [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)], "dx INT, dy INT"
    )
    probes = masks.select(
        F.col("z"), F.col("x").alias("cx"), F.col("y").alias("cy")
    ).crossJoin(F.broadcast(offsets)).select(
        "z", "cx", "cy", (F.col("cx") + F.col("dx")).alias("nx"),
        (F.col("cy") + F.col("dy")).alias("ny"), "dx", "dy",
    )
    joined = probes.join(
        masks.select(
            F.col("z").alias("z2"), F.col("x").alias("nx"), F.col("y").alias("ny"),
            "w", "h", "data",
        ),
        ["nx", "ny"],
    ).filter(F.col("z") == F.col("z2")).select("z", "cx", "cy", "dx", "dy", "w", "h", "data")

    def stitch(key, pdf: pd.DataFrame) -> pd.DataFrame:
        z, cx, cy = int(key[0]), int(key[1]), int(key[2])
        w = int(pdf["w"].iloc[0])
        h = int(pdf["h"].iloc[0])
        canvas = np.zeros((h + 2 * overlap, w + 2 * overlap), dtype=np.uint8)
        for _, r in pdf.iterrows():
            grid = np.frombuffer(r["data"], dtype=np.uint8).reshape(r["h"], r["w"])
            dx, dy = int(r["dx"]), int(r["dy"])
            # neighbor (dx,dy) occupies the block offset by (dx,dy) tiles
            # relative to the halo origin; clip to the canvas window
            x0 = overlap + dx * w
            y0 = overlap + dy * h
            sx0, sy0 = max(0, -x0), max(0, -y0)
            sx1 = min(w, canvas.shape[1] - x0)
            sy1 = min(h, canvas.shape[0] - y0)
            if sx1 > sx0 and sy1 > sy0:
                canvas[y0 + sy0 : y0 + sy1, x0 + sx0 : x0 + sx1] = grid[sy0:sy1, sx0:sx1]
        return pd.DataFrame(
            {
                "z": [np.int32(z)], "x": [cx], "y": [cy],
                "w": [canvas.shape[1]], "h": [canvas.shape[0]],
                "data": [canvas.tobytes()],
            }
        )

    return joined.groupBy("z", "cx", "cy").applyInPandas(stitch, HALO_SCHEMA)


def unbuffer(masks: DataFrame, overlap: int = 32) -> DataFrame:
    """Crop the halo border back off (G23, datasets.py:123-136)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                grid = np.frombuffer(r["data"], dtype=np.uint8).reshape(r["h"], r["w"])
                core = grid[overlap : r["h"] - overlap, overlap : r["w"] - overlap]
                rows.append(
                    (r["z"], r["x"], r["y"], core.shape[1], core.shape[0], core.tobytes())
                )
            if rows:
                yield pd.DataFrame(rows, columns=["z", "x", "y", "w", "h", "data"])

    return masks.mapInPandas(gen, HALO_SCHEMA)
