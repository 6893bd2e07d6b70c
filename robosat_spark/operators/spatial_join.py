"""Point-in-polygon page->feature assignment: the flagship spatial join (J2/J3).

Two physical strategies, chosen by the caller (Catalyst can't know spatial
semantics, so the choice is explicit — SURVEY.md §4):

``assign_broadcast``
    Filter-refine with a *broadcast* cover table: pages keep their scan
    partitioning (ZERO shuffle of the big side), the per-tile feature lists
    and ring coordinates ride a Spark broadcast, and the exact PIP refine is
    a vectorized Arrow batch pass. The right plan whenever the polygon side
    fits in executor memory (the common case: features « pages).

``assign_salted``
    Explicit salted-repartition-by-cell + per-partition spatial index
    (BASELINE.json north_rule): pages are hashed into ``salt`` buckets
    *within* each hot cell so one hot tile (the skew fixture holds ~50% of
    points) spreads over many tasks; each task refines against the
    broadcast per-tile index. The scale path when the candidate join is too
    hot for a single task, and the evidence path for skew handling.

Both refine with the same NumPy kernel; results are identical.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tiles import geotag_lat, geotag_lon, pack_tile_id, tile_x, tile_y
from ..kernels.geometry import as_ring, points_in_polygon


def geotagged_points(pages: DataFrame, zoom: int) -> DataFrame:
    """pages -> (url, warc_ts, lon, lat, tile_id): the scan-side prep.

    Geotag extraction is pure regex+cast (G27) and tile encode is pure
    arithmetic — both JVM-side, so Catalyst pushes the ``isNotNull`` filter
    into the scan and prunes every other column."""
    lon = geotag_lon(F.col("text"))
    lat = geotag_lat(F.col("text"))
    pts = pages.select(
        "url",
        "warc_ts",
        lon.alias("lon"),
        lat.alias("lat"),
    ).filter(F.col("lon").isNotNull() & F.col("lat").isNotNull())
    return pts.withColumn(
        "tile_id", pack_tile_id(zoom, tile_x(F.col("lon"), zoom), tile_y(F.col("lat"), zoom))
    )


def _collect_feature_index(features: DataFrame, cover_ids: DataFrame):
    """Driver-side build of {tile_id: [feature_id]} + {feature_id: rings}.

    The 'R-tree' of the reference (/root/reference/robosat/spatial/core.py:80-100)
    becomes a tile-bucketed index: the cover expansion IS the spatial index,
    and equi-join on tile_id replaces the bbox probe."""
    tile_map: dict[int, list[int]] = {}
    for row in cover_ids.collect():
        tile_map.setdefault(row["tile_id"], []).append(row["feature_id"])
    rings_map = {
        row["feature_id"]: [as_ring(r) for r in row["rings"]]
        for row in features.select("feature_id", "rings").collect()
    }
    return tile_map, rings_map


def _refine_factory(bc_index):
    """Arrow-batch PIP refine: for each batch, group points by candidate
    feature and run the vectorized crossing-number kernel once per feature."""

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tile_map, rings_map = bc_index.value
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            lon = pdf["lon"].to_numpy(dtype=np.float64)
            lat = pdf["lat"].to_numpy(dtype=np.float64)
            tids = pdf["tile_id"].to_numpy(dtype=np.int64)
            out_idx, out_fid = [], []
            # bucket rows by tile, then PIP per candidate feature
            order = np.argsort(tids, kind="stable")
            sorted_tids = tids[order]
            uniq = np.unique(sorted_tids)
            starts = np.searchsorted(sorted_tids, uniq, side="left")
            ends = np.searchsorted(sorted_tids, uniq, side="right")
            for t, s, e in zip(uniq.tolist(), starts.tolist(), ends.tolist()):
                fids = tile_map.get(t)
                if not fids:
                    continue
                rows = order[s:e]
                for fid in fids:
                    inside = points_in_polygon(lon[rows], lat[rows], rings_map[fid])
                    hit = rows[inside]
                    if hit.size:
                        out_idx.append(hit)
                        out_fid.append(np.full(hit.size, fid, dtype=np.int64))
            if out_idx:
                idx = np.concatenate(out_idx)
                res = pdf.iloc[idx][["url", "warc_ts", "lon", "lat", "tile_id"]].copy()
                res["feature_id"] = np.concatenate(out_fid)
                yield res

    return refine


_ASSIGN_SCHEMA = (
    "url STRING, warc_ts TIMESTAMP, lon DOUBLE, lat DOUBLE, tile_id LONG, feature_id LONG"
)


def assign_broadcast(
    spark: SparkSession, pages: DataFrame, features: DataFrame, zoom: int
) -> DataFrame:
    """Broadcast filter-refine PIP assignment. No shuffle of pages.

    Plan: scan -> regex/tile-encode (codegen) -> mapInPandas refine against
    the broadcast tile index. The tile prefilter and the exact refine happen
    in the same Arrow pass, so candidate rows never hit a shuffle."""
    from .cover import cover_tile_ids

    cover_ids = cover_tile_ids(features, zoom)
    bc = spark.sparkContext.broadcast(_collect_feature_index(features, cover_ids))
    pts = geotagged_points(pages, zoom)
    return pts.mapInPandas(_refine_factory(bc), _ASSIGN_SCHEMA)


def assign_salted(
    spark: SparkSession,
    pages: DataFrame,
    features: DataFrame,
    zoom: int,
    salt: int = 16,
) -> DataFrame:
    """Salted repartition-by-cell + per-partition broadcast index.

    ``repartition(salted_key)`` spreads each hot cell over ``salt`` tasks;
    the refine is identical. Use when candidate density per tile is too
    high for single tasks (hot-tile skew) and the downstream consumer
    benefits from cell-clustered output (e.g. a groupBy(tile) follows —
    the shuffle is then shared, not extra)."""
    from .cover import cover_tile_ids

    cover_ids = cover_tile_ids(features, zoom)
    bc = spark.sparkContext.broadcast(_collect_feature_index(features, cover_ids))
    pts = geotagged_points(pages, zoom)
    salted = pts.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(salt)).cast("int"))
    salted = salted.repartition(F.col("tile_id"), F.col("salt")).drop("salt")
    return salted.mapInPandas(_refine_factory(bc), _ASSIGN_SCHEMA)


def assign_counts_per_tile(assigned: DataFrame) -> DataFrame:
    """Aggregate: pages per (tile, feature) — the flagship readout."""
    return assigned.groupBy("tile_id", "feature_id").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("url").alias("n_urls"),
    )
