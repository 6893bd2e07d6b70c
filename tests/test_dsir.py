"""DSIR importance weighting (operators/dsir): feature arithmetic, the
keep rule's direction, degenerate rows, plan guard, and DuckDB-twin
parity on the real documents table."""

import duckdb
import pytest
from pyspark.sql import functions as F

from robosat_spark.operators.dsir import dsir_sql, dsir_weights

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "xx yy xx yy", "tgt"),
        (2, "xx yy zz", "tgt"),
        (3, "aa bb cc aa", "src"),
        (4, "aa bb", "src"),
        (5, "   ", "src"),  # no feature at all
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING, kind STRING")


def test_dsir_feature_count_and_direction(spark, corpus):
    got = {r.doc_id: r for r in
           dsir_weights(corpus, F.col("kind") == "tgt").collect()}
    # n_feats = unigrams + bigrams: 4 tokens -> 4 + 3 = 7; 3 -> 5; 2 -> 3
    assert got[1].n_feats == 7 and got[2].n_feats == 5
    assert got[3].n_feats == 7 and got[4].n_feats == 3
    # target-only vocabulary scores positive, source-only negative
    assert got[1].logw_micro > 0 and got[1].selected
    assert got[2].logw_micro > 0 and got[2].selected
    assert got[3].logw_micro < 0 and not got[3].selected
    assert got[4].logw_micro < 0 and not got[4].selected
    # featureless docs keep a 0/0/false row
    assert (got[5].n_feats, got[5].logw_micro, got[5].selected) == (0, 0, False)


def test_dsir_plan_guard(spark, corpus):
    plan = (
        dsir_weights(corpus, F.col("kind") == "tgt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        tuple(r) for r in dsir_weights(docs, F.col("lang") == "en").collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(map(tuple, con.sql(dsir_sql("documents", "lang = 'en'")).fetchall()))
    assert got == want
    # the keep rule actually partitions the corpus (neither all nor none)
    n_sel = sum(1 for r in got if r[3])
    assert 0 < n_sel < len(got)
