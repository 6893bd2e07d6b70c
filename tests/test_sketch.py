"""HyperLogLog distinct-count sketch: accuracy, mergeability, and the
DuckDB twin's bit-identical registers."""

import duckdb
import pyspark.sql.functions as F

from robosat_spark.operators.sketch import hll_buckets, hll_distinct, hll_sql


def test_hll_accuracy_p12(spark):
    """50k distinct strings at p=12 (4096 registers): the standard error
    of HLL is 1.04/sqrt(m) ~ 1.6%; assert the estimate lands within 5%."""
    df = spark.range(50_000).select(F.concat(F.lit("u"), F.col("id")).alias("s"))
    est = hll_distinct(df, "s", p=12).select("estimate").first()["estimate"]
    assert abs(est - 50_000) / 50_000 < 0.05, est


def test_hll_duplicates_ignored(spark):
    """1000 rows over 100 distinct values: the sketch sees cardinality,
    not row count."""
    df = spark.range(1000).select(F.concat(F.lit("v"), F.col("id") % 100).alias("s"))
    est = hll_distinct(df, "s", p=10).select("estimate").first()["estimate"]
    assert abs(est - 100) / 100 < 0.15, est


def test_hll_registers_merge_by_max(spark):
    """Re-aggregation property (the 100 TB story): sketching two halves
    separately and merging registers bucket-wise by MAX equals sketching
    the whole — partial sketches of table slices compose."""
    df = spark.range(5_000).select(F.concat(F.lit("k"), F.col("id")).alias("s"))
    whole = hll_buckets(df, "s", p=8)
    a = hll_buckets(df.filter(F.col("s").substr(2, 9).cast("long") % 2 == 0), "s", p=8)
    b = hll_buckets(df.filter(F.col("s").substr(2, 9).cast("long") % 2 == 1), "s", p=8)
    merged = (
        a.unionByName(b)
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    got = {(r["bucket"], r["max_rho"]) for r in merged.collect()}
    want = {(r["bucket"], r["max_rho"]) for r in whole.collect()}
    assert got == want


def test_hll_plan_partial_aggregation(spark):
    """The register build must be a two-phase hash aggregate (map-side
    partial_max before the shuffle — each scan partition collapses to
    <= 2^p rows) with no Python in the plan."""
    df = spark.range(10_000).select(F.concat(F.lit("x"), F.col("id")).alias("s"))
    plan = hll_buckets(df, "s", p=8)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_hll_duckdb_twin_bit_identical(spark, tmp_path):
    """The SQL twin reproduces the IDENTICAL register table and estimate
    (hash, rho, and estimator expressions are engine-replayable)."""
    df = spark.range(3_000).select(F.concat(F.lit("d"), F.col("id")).alias("s"))
    p = 7
    got = {
        (r["bucket"], r["max_rho"], r["estimate"])
        for r in hll_distinct(df, "s", p=p).collect()
    }
    path = str(tmp_path / "vals.parquet")
    df.write.parquet(path)
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.execute(hll_sql(f"'{path}/*.parquet'", "s", p=p)).fetchall()
    }
    assert got == want
