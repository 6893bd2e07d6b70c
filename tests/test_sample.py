"""Deterministic sampling/split operators (operators/sample)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from robosat_spark.operators.sample import (
    hash_sample,
    hash_sample_sql,
    sample_hash,
    split_assign,
    split_assign_sql,
    stratified_sample,
    stratified_sample_sql,
    threshold,
)


def test_threshold_bounds():
    assert threshold(0.0) == 0
    assert threshold(1.0) == 1 << 60
    with pytest.raises(ValueError):
        threshold(1.5)
    with pytest.raises(ValueError):
        threshold(-0.1)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 2000).select(F.col("id").alias("k"))


def test_hash_sample_deterministic_and_unbiased(spark, ids):
    a = {r["k"] for r in hash_sample(ids, "k", 0.3, salt="s").collect()}
    b = {r["k"] for r in hash_sample(ids, "k", 0.3, salt="s").collect()}
    assert a == b  # rerun-stable
    assert 0.25 < len(a) / 2000 < 0.35  # binomial around 0.3
    # repartitioning must not change membership
    c = {r["k"] for r in
         hash_sample(ids.repartition(13), "k", 0.3, salt="s").collect()}
    assert c == a
    # nested fractions nest: the 10% sample is a subset of the 30% one
    d = {r["k"] for r in hash_sample(ids, "k", 0.1, salt="s").collect()}
    assert d < a


def test_salt_decorrelates(spark, ids):
    a = {r["k"] for r in hash_sample(ids, "k", 0.5, salt="x").collect()}
    b = {r["k"] for r in hash_sample(ids, "k", 0.5, salt="y").collect()}
    assert a != b
    overlap = len(a & b) / max(1, len(a))
    assert 0.3 < overlap < 0.7  # ~independent halves intersect at ~50%


def test_split_assign_partitions_exactly(spark, ids):
    out = split_assign(ids, "k", salt="cv").collect()
    assert len(out) == 2000  # every row assigned exactly once
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert 0.74 < counts["train"] / 2000 < 0.86
    assert 0.06 < counts["val"] / 2000 < 0.14
    assert 0.06 < counts["test"] / 2000 < 0.14
    with pytest.raises(ValueError):
        split_assign(ids, "k", weights=(0.5, 0.2))
    with pytest.raises(ValueError):
        split_assign(ids, "k", weights=(0.5, 0.2, 0.2))


def test_stratified_sample(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    out = stratified_sample(df, "k", "lang", {"en": 0.5}, default=0.05,
                            salt="s").groupBy("lang").count().collect()
    rates = {r["lang"]: r["count"] for r in out}
    assert 0.4 < rates["en"] / 1000 < 0.6
    assert 0.02 < rates.get("de", 0) / 2000 < 0.09


def test_sql_twins_match_spark(spark, ids):
    """Membership equality per row — the hash, thresholds, and CASE
    structure replay exactly in DuckDB."""
    spark_rows = sorted(
        (r["k"], r["split"], r["b20"])
        for r in split_assign(ids, "k", salt="cv")
        .withColumn("b20", sample_hash(F.col("k"), "qa") < F.lit(threshold(0.2)))
        .collect()
    )
    q = f"""
        SELECT k, {split_assign_sql('k', salt='cv')} AS split,
               {hash_sample_sql('k', 0.2, salt='qa')} AS b20
        FROM (SELECT UNNEST(RANGE(0, 2000)) AS k)
        ORDER BY k
    """
    duck_rows = [tuple(r) for r in duckdb.sql(q).fetchall()]
    assert spark_rows == duck_rows
    # stratified twin
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("de").alias("lang"),
    )
    s = sorted(r["k"] for r in
               stratified_sample(df, "k", "lang", {"en": 0.5}, default=0.1,
                                 salt="st").collect())
    w = stratified_sample_sql("k", "lang", {"en": 0.5}, default=0.1, salt="st")
    d = [r[0] for r in duckdb.sql(f"""
        SELECT k FROM (
          SELECT k, CASE WHEN k % 3 = 0 THEN 'en' ELSE 'de' END AS lang
          FROM (SELECT UNNEST(RANGE(0, 500)) AS k)
        ) WHERE {w} ORDER BY k
    """).fetchall()]
    assert s == d


def test_null_key_never_sampled(spark):
    df = spark.createDataFrame([(None,), (1,)], "k LONG")
    assert hash_sample(df, "k", 1.0).count() == 1
