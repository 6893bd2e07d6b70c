"""knn_cells (cell-block equi-join + exactness bound) vs brute force;
Column cell encoders vs kernel twins."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from robosat_spark.operators.knn import knn_bruteforce


@pytest.fixture(scope="module")
def points(spark):
    rows = [
        (f"u{i}", -82.84 + (i * 37 % 100) * 0.0004, 34.66 + (i * 53 % 100) * 0.0003)
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "url STRING, lon DOUBLE, lat DOUBLE")


@pytest.fixture(scope="module")
def dense_feats(spark):
    from robosat_spark.sources.fixtures import dense_polygon_features

    return dense_polygon_features(spark, n=100, vertices=16, grid=10)


def test_knn_cells_exact_sparse_and_dense(spark, points, dense_feats):
    """knn_cells must equal brute force EXACTLY (ids AND ranks), both when
    ring-1 suffices (dense) and when points must expand several rings or
    fall through to the tail (sparse 2-feature case that breaks the old
    smallest-sufficient-neighborhood heuristic)."""
    from robosat_spark.operators.knn import knn_cells

    for feats, k, zoom in [(dense_feats, 3, 13), (None, 2, 10)]:
        if feats is None:
            from robosat_spark.sources.fixtures import features

            feats = features(spark).filter(F.col("feature_id") < 2)
        want = {
            (r["url"], r["rank"]): (r["feature_id"], round(r["dist_deg"], 9))
            for r in knn_bruteforce(points, feats, k=k).collect()
        }
        got = {
            (r["url"], r["rank"]): (r["feature_id"], round(r["dist_deg"], 9))
            for r in knn_cells(spark, points, feats, k=k, zoom=zoom).collect()
        }
        assert got == want


def test_knn_cells_plan_has_no_nested_loop_in_ring_rounds(spark, points, dense_feats):
    """The ring rounds must be cell-key equi-joins; the only BNLJ allowed is
    the tiny broadcast tail fallback (crossJoin of stragglers), which is
    rank-bounded and explicitly exact."""
    from robosat_spark.operators.knn import knn_cells

    out = knn_cells(spark, points, dense_feats, k=3, zoom=13, max_doublings=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # ring-round joins are hash joins on (cx, cy); count BNLJ occurrences —
    # exactly one is the sanctioned tail crossJoin
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_column_cell_encoders_match_kernels(spark):
    from robosat_spark.functions.tiles import morton_cell, quadkey
    from robosat_spark.kernels import mercator as M

    rows = [(3, 5, 3), (0, 0, 3), (7, 7, 3)]
    df = spark.createDataFrame(rows, "x LONG, y LONG, z INT")
    got = df.select(
        quadkey(F.col("x"), F.col("y"), 3).alias("qk"),
        morton_cell(F.col("x"), F.col("y"), 3).alias("m"),
    ).collect()
    for (x, y, z), r in zip(rows, got):
        assert r["qk"] == M.quadkey(x, y, z)
        km, _ = M.morton_cell(np.array([x]), np.array([y]), z)
        assert r["m"] == int(km[0])


def test_asof_join_semantics(spark):
    from robosat_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 50), (2, 20, 100)],
        "k LONG, lid LONG, lts LONG",
    )
    right = spark.createDataFrame(
        [(1, 900, 40), (1, 901, 99), (1, 902, 99), (1, 903, 101), (3, 904, 10)],
        "k LONG, rid LONG, rts LONG",
    )
    out = asof_join(left, right, key="k", left_id="lid", left_ts="lts",
                    right_ts="rts", right_id="rid", how="left")
    got = {r["lid"]: r["r_rid"] for r in out.collect()}
    assert got[10] == 902  # ts tie at 99 -> highest rid wins
    assert got[11] == 900  # only rts<=50 candidate
    assert got[20] is None  # key 2 has no right rows (left join keeps it)
    assert len(got) == 3


def test_tile_pyramid_rollup_conserves_counts(spark):
    import __spark_entry__ as e

    out = e.queries()["tile_pyramid_rollup"](spark, "/root/testdata/sf0.001")
    per_z = {r["z"]: r["s"] for r in out.groupBy("z").agg(F.sum("n").alias("s")).collect()}
    assert set(per_z) == {8, 9, 10, 11, 12}
    assert len(set(per_z.values())) == 1  # every pyramid level conserves the total


def test_hex_cell_locality(spark):
    from robosat_spark.functions.tiles import hex_cell

    df = spark.createDataFrame(
        [(0, -82.8200, 34.6780), (1, -82.8201, 34.6781), (2, -80.0, 36.0)],
        "id LONG, lon DOUBLE, lat DOUBLE",
    )
    cells = {
        r["id"]: r["h"]
        for r in df.select("id", hex_cell(F.col("lon"), F.col("lat"), 1000.0).alias("h")).collect()
    }
    assert cells[0] == cells[1]  # ~15 m apart -> same 1 km hex
    assert cells[0] != cells[2]  # ~300 km apart -> different


def test_morton_ranges_exact_cover_and_superset():
    """Quadtree Z-order decomposition: with an unbounded range budget the
    cover is EXACT (tile in bbox <=> morton in some interval); with a tight
    budget it's a superset (pruning stays correct)."""
    from robosat_spark.functions.tiles import _morton_py, morton_ranges

    z = 6
    rng = np.random.RandomState(4)
    for _ in range(20):
        x0, y0 = rng.randint(0, 60, 2)
        x1, y1 = x0 + rng.randint(0, 63 - x0), y0 + rng.randint(0, 63 - y0)
        exact = morton_ranges(int(x0), int(y0), int(x1), int(y1), z, max_ranges=10**6)
        tight = morton_ranges(int(x0), int(y0), int(x1), int(y1), z, max_ranges=4)
        assert len(tight) <= 4
        for x in range(64):
            for y in range(64):
                m = _morton_py(x, y)
                inside = x0 <= x <= x1 and y0 <= y <= y1
                in_exact = any(lo <= m <= hi for lo, hi in exact)
                assert in_exact == inside, (x, y)
                if inside:
                    assert any(lo <= m <= hi for lo, hi in tight)


def test_morton_range_scan_pruned_and_equivalent(spark, tmp_path):
    """Z-ordered layout + morton_range_filter: same rows as the direct
    lon/lat bbox filter, and the morton BETWEEN predicates reach the
    parquet scan (PushedFilters) so row-group stats can prune."""
    from robosat_spark.functions.tiles import (
        morton_cell,
        morton_range_filter,
        morton_ranges,
        tile_x,
        tile_y,
    )
    from robosat_spark.operators.spatial_join import geotagged_points
    from robosat_spark.sources.pages import pages

    zoom = 10
    pts = geotagged_points(pages(spark, 4000), zoom=zoom).withColumn(
        "morton", morton_cell(tile_x(F.col("lon"), zoom), tile_y(F.col("lat"), zoom), zoom)
    )
    path = str(tmp_path / "zordered")
    # the Z-ORDER layout: sort by morton so row groups are spatially tight
    pts.repartition(1).sortWithinPartitions("morton").write.parquet(path)
    table = spark.read.parquet(path)

    lon0, lon1, lat0, lat1 = -83.0, -82.0, 34.0, 35.0
    tx0, tx1 = spark.range(1).select(
        tile_x(F.lit(lon0), zoom), tile_x(F.lit(lon1), zoom)
    ).collect()[0]
    ty0, ty1 = spark.range(1).select(
        tile_y(F.lit(lat1), zoom), tile_y(F.lit(lat0), zoom)
    ).collect()[0]
    ranges = morton_ranges(tx0, ty0, tx1, ty1, zoom, max_ranges=32)

    direct = table.filter(
        (F.col("lon") >= lon0) & (F.col("lon") <= lon1)
        & (F.col("lat") >= lat0) & (F.col("lat") <= lat1)
    )
    pruned = table.filter(morton_range_filter(F.col("morton"), ranges)).filter(
        (F.col("lon") >= lon0) & (F.col("lon") <= lon1)
        & (F.col("lat") >= lat0) & (F.col("lat") <= lat1)
    )
    a = sorted(r["url"] for r in direct.collect())
    b = sorted(r["url"] for r in pruned.collect())
    assert a == b and len(a) > 0

    plan = table.filter(
        morton_range_filter(F.col("morton"), ranges)
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "morton" in plan.split("PushedFilters")[1][:400], plan


def test_knn_tail_strategy_guard(spark, points, dense_feats):
    """Oversized feature side -> the tail must choose the non-broadcast
    cartesian path (and the tiny fixture side stays broadcast)."""
    from robosat_spark.operators.knn import (
        choose_knn_tail_strategy,
        estimate_centroid_bytes,
        knn_cells,
    )

    est = estimate_centroid_bytes(dense_feats)
    assert est > 0
    assert choose_knn_tail_strategy(dense_feats) == "broadcast"
    # shrink the budget below the estimate: the safe path is selected
    assert choose_knn_tail_strategy(dense_feats, max_broadcast_bytes=est - 1) == "cartesian"

    # the cartesian tail is exact: same rows as the broadcast-tail plan,
    # forced by max_doublings=0 so EVERY point goes through the tail
    wide = knn_cells(spark, points, dense_feats, k=2, zoom=7, max_doublings=0)
    tight = knn_cells(
        spark, points, dense_feats, k=2, zoom=7, max_doublings=0, max_broadcast_bytes=1
    )
    a = sorted(map(tuple, wide.select("url", "feature_id", "rank").collect()))
    b = sorted(map(tuple, tight.select("url", "feature_id", "rank").collect()))
    assert a == b and len(a) > 0
