"""Tile cover: polygon features -> covering z-level tiles (G2/J2, `rs cover`).

Reference behavior: per-feature ``burntiles.burn`` then set-union
(/root/reference/robosat/tools/cover.py:23-37). Here: Arrow-batched
``mapInPandas`` running the exact NumPy cover kernel, then ``distinct()``
(Catalyst partial+final hash agg = the set union, SURVEY.md §3.1).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import pack_tile_id
from ..kernels.geometry import as_ring
from ..kernels.raster import cover_rings


def cover(features: DataFrame, zoom: int, keep_feature_id: bool = True) -> DataFrame:
    """-> DataFrame(feature_id?, z, x, y): tiles each feature intersects.

    The UDTF-like cover expansion: one input feature row fans out to its
    covered tiles (cheap vs the page-side volume; features are the small
    side of every downstream join)."""

    out_schema = "feature_id LONG, z INT, x LONG, y LONG"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fids, xs, ys = [], [], []
            for fid, rings in zip(pdf["feature_id"], pdf["rings"]):
                tiles = cover_rings([as_ring(r) for r in rings], zoom)
                if len(tiles):
                    fids.append(np.full(len(tiles), fid, dtype=np.int64))
                    xs.append(tiles[:, 0])
                    ys.append(tiles[:, 1])
            if fids:
                yield pd.DataFrame(
                    {
                        "feature_id": np.concatenate(fids),
                        "z": np.int32(zoom),
                        "x": np.concatenate(xs),
                        "y": np.concatenate(ys),
                    }
                )

    covered = features.select("feature_id", "rings").mapInPandas(gen, out_schema)
    if keep_feature_id:
        return covered
    return covered.select("z", "x", "y").distinct()


def cover_tile_ids(features: DataFrame, zoom: int) -> DataFrame:
    """-> DataFrame(feature_id, tile_id) keyed by the packed cell id."""
    c = cover(features, zoom, keep_feature_id=True)
    return c.select("feature_id", pack_tile_id(zoom, F.col("x"), F.col("y")).alias("tile_id"))
