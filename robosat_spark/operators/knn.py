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


def _tile_edge_lon(x: "F.Column", zoom: int) -> "F.Column":
    """West longitude of tile column ``x`` (slippy formula, JVM)."""
    n = float(1 << zoom)
    return x.cast("double") / F.lit(n) * 360.0 - 180.0


def _tile_edge_lat(y: "F.Column", zoom: int) -> "F.Column":
    """North latitude of tile row ``y``: degrees(atan(sinh(pi*(1-2y/n))))."""
    import math

    n = float(1 << zoom)
    return F.degrees(F.atan(F.sinh(F.lit(math.pi) * (1.0 - 2.0 * y.cast("double") / F.lit(n)))))


def knn_cells(
    spark: SparkSession,
    points: DataFrame,
    features: DataFrame,
    k: int = 3,
    zoom: int = 7,
    max_doublings: int = 5,
) -> DataFrame:
    """EXACT distributed kNN via neighbor-cell equi-joins (the scale path;
    ``knn_bruteforce`` is the O(P·F) oracle it must match).

    Per round, each unresolved point explodes into its (2r+1)² block of
    cells at ``zoom`` and hash-joins feature centroids on the cell key —
    never a theta predicate, so the plan is ShuffledHashJoin/SortMergeJoin
    territory, not BroadcastNestedLoopJoin. A point RESOLVES only when its
    kth-candidate distance is strictly below the distance to the block
    boundary (west/east lon edges scaled by cos(lat), north/south mercator
    lat edges; world-edge sides are unbounded-safe) — the classic grid-kNN
    exactness condition: no feature outside the block can beat the kth.
    Unresolved points double the ring; stragglers after ``max_doublings``
    fall back to the exact broadcast brute force (they are few by then).

    Reference analog: exact spatial probes in robosat/spatial/core.py:80-100
    (R-tree query + exact refine); the cell grid replaces the R-tree."""
    n = 1 << zoom
    cents = feature_centroids(features)
    cents = cents.withColumn("cx", tile_x(F.col("c_lon"), zoom)).withColumn(
        "cy", tile_y(F.col("c_lat"), zoom)
    ).localCheckpoint(eager=False)
    pts = points.select("url", "lon", "lat").withColumn(
        "px", tile_x(F.col("lon"), zoom)
    ).withColumn("py", tile_y(F.col("lat"), zoom))

    coslat = F.cos(F.radians(F.col("lat")))
    d2 = ((F.col("lon") - F.col("c_lon")) * coslat) ** 2 + (F.col("lat") - F.col("c_lat")) ** 2

    resolved_parts = []
    remaining = pts
    r = 1
    for _ in range(max_doublings):
        probe = remaining.withColumn("dx", F.explode(F.sequence(F.lit(-r), F.lit(r)))).withColumn(
            "dy", F.explode(F.sequence(F.lit(-r), F.lit(r)))
        ).select(
            "url", "lon", "lat", "px", "py",
            (F.col("px") + F.col("dx")).alias("cx"),
            (F.col("py") + F.col("dy")).alias("cy"),
        )
        cand = probe.join(cents, ["cx", "cy"]).withColumn("d2", d2)
        wrank = Window.partitionBy("url").orderBy(F.col("d2").asc(), F.col("feature_id").asc())
        wall = Window.partitionBy("url")
        cand = cand.withColumn("rank", F.row_number().over(wrank))
        cand = cand.withColumn("n_cand", F.count("*").over(wall)).withColumn(
            "kth_d2", F.max(F.when(F.col("rank") <= k, F.col("d2"))).over(wall)
        )
        # distance from the point to the nearest possible OUTSIDE feature:
        # min over the four block edges, world-edge sides excluded (nothing
        # lives beyond the antimeridian clamp / pole clamp at this zoom)
        inf = F.lit(float("inf"))
        dw = F.when(F.col("px") - r <= 0, inf).otherwise(
            (F.col("lon") - _tile_edge_lon(F.col("px") - r, zoom)) * coslat
        )
        de = F.when(F.col("px") + r >= n - 1, inf).otherwise(
            (_tile_edge_lon(F.col("px") + r + 1, zoom) - F.col("lon")) * coslat
        )
        dn = F.when(F.col("py") - r <= 0, inf).otherwise(
            _tile_edge_lat(F.col("py") - r, zoom) - F.col("lat")
        )
        ds = F.when(F.col("py") + r >= n - 1, inf).otherwise(
            F.col("lat") - _tile_edge_lat(F.col("py") + r + 1, zoom)
        )
        bound = F.least(dw, de, dn, ds)
        ok = (F.col("n_cand") >= k) & (F.col("kth_d2") < bound * bound)
        resolved_parts.append(cand.filter(ok & (F.col("rank") <= k)))
        remaining = remaining.join(
            cand.filter(ok).select("url").distinct(), "url", "left_anti"
        ).localCheckpoint(eager=False)
        r *= 2

    # exact fallback for the (few) stragglers — keeps the operator total.
    # Inlined (not knn_bruteforce) so d2 is computed once, never via a
    # sqrt->square round-trip that could differ in the last ulp.
    tail = remaining.select("url", "lon", "lat")
    tail_cand = tail.crossJoin(F.broadcast(feature_centroids(features))).withColumn("d2", d2)
    wtail = Window.partitionBy("url").orderBy(F.col("d2").asc(), F.col("feature_id").asc())
    resolved_parts.append(
        tail_cand.withColumn("rank", F.row_number().over(wtail))
        .filter(F.col("rank") <= k)
        .select("url", "lon", "lat", "feature_id", "d2", "rank")
    )

    out = resolved_parts[0].select("url", "lon", "lat", "feature_id", "d2", "rank")
    for part in resolved_parts[1:]:
        out = out.unionByName(part.select("url", "lon", "lat", "feature_id", "d2", "rank"))
    return out.select(
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
