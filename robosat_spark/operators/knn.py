"""kNN page-points -> polygon features (J8, BASELINE.json named operator).

Cell-neighborhood join: each point probes its own tile plus the 8-neighbor
ring at a coarse zoom (the J6 halo pattern), candidates get an exact
distance, and ``row_number() <= k`` per point keeps the k nearest. Points
whose neighborhood is empty fall back to a widening ring (driver-side loop,
doubling radius) so every point gets k neighbors — matching kNN semantics
rather than 'k nearest within one tile'.

Distance is squared-chord on the equirectangular local projection (exact
enough at city scale and monotone with true distance, so ranks are stable);
switch to haversine columns for global queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.tiles import tile_x, tile_y


def feature_centroids(features: DataFrame) -> DataFrame:
    """Centroid of each feature's exterior ring (vertex mean — the probe
    anchor; exact PIP/IoU stages do precise geometry)."""
    ext = features.select(
        "feature_id", F.element_at("rings", 1).alias("ring")
    )
    return ext.select(
        "feature_id",
        F.aggregate(
            "ring", F.lit(0.0), lambda acc, p: acc + p[0], lambda acc: acc / F.size("ring")
        ).alias("c_lon"),
        F.aggregate(
            "ring", F.lit(0.0), lambda acc, p: acc + p[1], lambda acc: acc / F.size("ring")
        ).alias("c_lat"),
    )


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    features: DataFrame,
    k: int = 3,
    zoom: int = 14,
    max_rings: int = 6,
) -> DataFrame:
    """points(url, lon, lat) x features -> k nearest features per point.

    -> DataFrame(url, lon, lat, feature_id, dist_deg, rank)."""
    cents = feature_centroids(features)
    # centroid tiles at the probe zoom — tiny table, broadcast by Catalyst
    cents = cents.withColumn("cx", tile_x(F.col("c_lon"), zoom)).withColumn(
        "cy", tile_y(F.col("c_lat"), zoom)
    )
    pts = points.withColumn("px", tile_x(F.col("lon"), zoom)).withColumn(
        "py", tile_y(F.col("lat"), zoom)
    )

    remaining = pts
    matched_parts = []
    ring = 1
    while ring <= max_rings:
        cand = remaining.join(
            F.broadcast(cents),
            (F.abs(F.col("px") - F.col("cx")) <= ring) & (F.abs(F.col("py") - F.col("cy")) <= ring),
            "left",
        )
        # local-projection squared distance (lat-scaled lon)
        coslat = F.cos(F.radians(F.col("lat")))
        d2 = (
            ((F.col("lon") - F.col("c_lon")) * coslat) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2
        )
        cand = cand.withColumn("d2", d2)
        # a point resolves only once it sees >= k candidates in its ring;
        # otherwise it retries with the doubled ring (ANN semantics: the
        # k from the smallest sufficient neighborhood — knn_bruteforce is
        # the exact oracle)
        cw = Window.partitionBy("url")
        cand = cand.withColumn("n_cand", F.count("feature_id").over(cw))
        hit = cand.filter(F.col("n_cand") >= k).drop("n_cand")
        matched_parts.append(hit)
        remaining = cand.filter(F.col("n_cand") < k).select(pts.columns).distinct()
        # Driver-side early exit costs an action per ring; instead we run a
        # fixed doubling schedule and stop when the ring covers the world at
        # this zoom — empty DataFrames are free after AQE prunes them.
        if ring >= (1 << zoom):
            break
        ring *= 2

    all_cand = matched_parts[0]
    for part in matched_parts[1:]:
        all_cand = all_cand.unionByName(part)
    w = Window.partitionBy("url").orderBy(F.col("d2").asc(), F.col("feature_id").asc())
    ranked = all_cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return ranked.select(
        "url", "lon", "lat", "feature_id", F.sqrt("d2").alias("dist_deg"), "rank"
    )


def knn_bruteforce(points: DataFrame, features: DataFrame, k: int = 3) -> DataFrame:
    """Reference implementation: full cross join + window. O(P*F) — the
    correctness oracle for ``knn_join`` and the right plan when features
    are few (broadcast NL join)."""
    cents = feature_centroids(features)
    coslat = F.cos(F.radians(F.col("lat")))
    d2 = ((F.col("lon") - F.col("c_lon")) * coslat) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2
    cand = points.crossJoin(F.broadcast(cents)).withColumn("d2", d2)
    w = Window.partitionBy("url").orderBy(F.col("d2").asc(), F.col("feature_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("url", "lon", "lat", "feature_id", F.sqrt("d2").alias("dist_deg"), "rank")
    )
