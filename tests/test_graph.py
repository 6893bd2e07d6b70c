"""Fixed-point PageRank (operators/graph).

The load-bearing property is REPRODUCIBILITY: ranks are int64 fixed-point
(1e9 scale) and every iteration is integer arithmetic, so the same graph
must produce byte-identical ranks at any parallelism — the property a
floating-point PageRank cannot offer across cluster sizes. Tests pin the
recurrence against an independent pure-Python reference, the DuckDB twin,
and a partitioning sweep.
"""

from collections import Counter, defaultdict

import duckdb
import pytest
from pyspark.sql import functions as F

from robosat_spark.operators.graph import (
    SCALE,
    pagerank,
    pagerank_sql,
    synthetic_web_edges,
    synthetic_web_edges_sql,
)


def ref_pagerank(edges, iters, d_num=85, d_den=100):
    """Independent pure-Python replay of the documented integer recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = Counter(s for s, _ in edges)
    rank = {v: SCALE // n for v in nodes}
    base = ((d_den - d_num) * SCALE // n) // d_den
    for _ in range(iters):
        insum = defaultdict(int)
        for s, d in edges:
            insum[d] += rank[s] // deg[s]
        dang = sum(rank[v] for v in nodes if deg[v] == 0)
        rank = {
            v: base + d_num * (insum[v] + dang // n) // d_den for v in nodes
        }
    return rank


# a small web: 0 is an authority, 3 dangles, 4/5 form a cycle, multi-edge 1->0
TINY = [(1, 0), (1, 0), (2, 0), (1, 3), (2, 3), (4, 5), (5, 4), (0, 3)]


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, **kw).collect()
    return {r["node"]: r["rank_ppb"] for r in out}


def test_matches_pure_python_reference(spark):
    got = _run(spark, TINY, num_iters=5)
    assert got == ref_pagerank(TINY, 5)


def test_mass_conserved_within_floor_deficit(spark):
    got = _run(spark, TINY, num_iters=8)
    total = sum(got.values())
    # each DIV floors: deficit bounded by (E + N + 1) per round per 1e9
    assert SCALE * 0.99 < total <= SCALE


def test_star_authority_ranks_highest(spark):
    star = [(i, 0) for i in range(1, 8)]
    got = _run(spark, star, num_iters=6)
    assert got[0] == max(got.values())
    assert got == ref_pagerank(star, 6)


def test_dangling_mass_redistributed(spark):
    # 1 -> 0, 0 dangles: without redistribution node 1 starves to base
    got = _run(spark, [(1, 0)], num_iters=4)
    assert got == ref_pagerank([(1, 0)], 4)
    assert got[1] > ((100 - 85) * SCALE // 2) // 100  # above bare base


def test_bit_identical_across_parallelism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = synthetic_web_edges(docs)
    a = pagerank(edges, num_iters=4, shuffle_partitions=2).collect()
    b = pagerank(edges, num_iters=4, shuffle_partitions=16).collect()
    assert sorted((r["node"], r["rank_ppb"]) for r in a) == sorted(
        (r["node"], r["rank_ppb"]) for r in b
    )


def test_duckdb_twin_bit_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(
        (r["node"], r["rank_ppb"])
        for r in pagerank(synthetic_web_edges(docs), num_iters=3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                pagerank_sql(synthetic_web_edges_sql("documents"), num_iters=3)
            ).fetchall(),
        )
    )
    assert got == want


def test_synthetic_edges_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = synthetic_web_edges(docs)
    assert e.filter(F.col("src") % 7 == 0).count() == 0  # dangling pages
    assert e.filter(F.col("src") == F.col("dst")).count() == 0
    assert e.filter((F.col("dst") < 0) | (F.col("dst") >= 500)).count() == 0


def test_final_round_plan_is_hash_join_only(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pr = pagerank(synthetic_web_edges(docs), num_iters=2)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_validation(spark):
    df = spark.createDataFrame(TINY, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, num_iters=0)
    with pytest.raises(ValueError):
        pagerank(df, d_num=100, d_den=100)
