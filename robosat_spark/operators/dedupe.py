"""IoU dedupe (`rs dedupe`): drop predicted features already mapped in OSM.

Reference chain (/root/reference/robosat/tools/dedupe.py:30-73): per
predicted shape, R-tree bbox candidates -> exact ``intersects`` refine ->
union of intersecting OSM shapes -> keep when ``iou(pred, union) <
threshold``; vacuous cases (no candidates / no intersecting) keep.

Spark shape (J4), fully distributed: cell-grid LEFT OUTER join predicted x
osm at ``cell_zoom`` with BOTH ring payloads flowing through the join (no
driver-side collection — either side can be web-scale) ->
groupBy(predicted).applyInPandas(intersects refine -> union -> IoU) ->
filter. The predicate cascade is explicit: null-join short-circuit first,
cheap exact-intersects second, expensive IoU only on survivors
(dedupe.py:51-64 ordering, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..kernels import geometry as G
from ..kernels import mercator as M

DEDUP_SCHEMA = "pred_id LONG, iou DOUBLE, n_candidates INT, keep BOOLEAN"


def _rings_np(rings):
    return [
        np.vstack([np.asarray(p, dtype=np.float64) for p in ring]) for ring in rings
    ]


def _cells_df(features: DataFrame, id_col: str, cell_zoom: int) -> DataFrame:
    """(feature_id, rings) -> (id, cx, cy, rings): bbox cover cells at the
    index zoom, ring payload carried along for the group-local refine."""
    n = 1 << cell_zoom

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, rings in zip(pdf["feature_id"], pdf["rings"]):
                ext = _rings_np(rings)[0]
                x0, y0 = M.lonlat_to_tile(ext[:, 0].min(), ext[:, 1].max(), cell_zoom)
                x1, y1 = M.lonlat_to_tile(ext[:, 0].max(), ext[:, 1].min(), cell_zoom)
                clean = [[list(map(float, p)) for p in ring] for ring in rings]
                for cx in range(int(x0), min(int(x1), n - 1) + 1):
                    for cy in range(int(y0), min(int(y1), n - 1) + 1):
                        rows.append((fid, cx, cy, clean))
            if rows:
                yield pd.DataFrame(rows, columns=[id_col, "cx", "cy", "rings"])

    return features.select("feature_id", "rings").mapInPandas(
        gen, f"{id_col} LONG, cx LONG, cy LONG, rings ARRAY<ARRAY<ARRAY<DOUBLE>>>"
    )


def dedupe(
    spark: SparkSession,
    predicted: DataFrame,
    osm: DataFrame,
    threshold: float = 0.5,
    cell_zoom: int = 16,
    iou_resolution: int = 256,
) -> DataFrame:
    """-> (pred_id, iou, n_candidates, keep): keep = not already mapped.

    ``iou`` is 0.0 for vacuous keeps (no bbox candidates / none intersect),
    mirroring the reference's short-circuit keeps."""
    pcells = _cells_df(predicted, "pred_id", cell_zoom).withColumnRenamed(
        "rings", "pred_rings"
    )
    ocells = _cells_df(osm, "osm_id", cell_zoom).withColumnRenamed("rings", "osm_rings")
    cand = (
        pcells.join(ocells, ["cx", "cy"], "left_outer")
        .select("pred_id", "pred_rings", "osm_id", "osm_rings")
        .dropDuplicates(["pred_id", "osm_id"])
    )

    def judge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(key[0])
        pred_rings = _rings_np(pdf["pred_rings"].iloc[0])
        cands = [
            (int(o), _rings_np(r))
            for o, r in zip(pdf["osm_id"], pdf["osm_rings"])
            if pd.notna(o)
        ]
        if not cands:  # no bbox candidates -> keep (dedupe.py:51-52)
            return pd.DataFrame([(pid, 0.0, 0, True)],
                                columns=["pred_id", "iou", "n_candidates", "keep"])
        intersecting = [
            rings for _, rings in cands if G.rings_intersect(pred_rings[0], rings[0])
        ]
        if not intersecting:  # none intersect -> keep (dedupe.py:58-59)
            return pd.DataFrame([(pid, 0.0, len(cands), True)],
                                columns=["pred_id", "iou", "n_candidates", "keep"])
        iou = G.raster_iou_multi([pred_rings], intersecting, resolution=iou_resolution)
        return pd.DataFrame(
            [(pid, float(iou), len(cands), bool(iou < threshold))],
            columns=["pred_id", "iou", "n_candidates", "keep"],
        )

    return cand.groupBy("pred_id").applyInPandas(judge, DEDUP_SCHEMA)


def dedupe_kept_features(predicted: DataFrame, verdicts: DataFrame) -> DataFrame:
    """Join back: the kept predicted features (the `rs dedupe` output file)."""
    return predicted.join(
        verdicts.filter(F.col("keep")).select(F.col("pred_id").alias("feature_id")),
        "feature_id",
        "left_semi",
    )
