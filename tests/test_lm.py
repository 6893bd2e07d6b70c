"""Bigram-LM quality scoring (operators/lm): hand-computed micro
fixed-point log-probs, smoothing normalization, short-doc rows, plan
guard, and DuckDB-twin parity on the real documents table."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from robosat_spark.operators.lm import bigram_lm_scores, bigram_lm_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b a b"),
        (2, "A b"),  # lowercased -> shares the (a, b) bigram
        (3, "z"),  # one token: no bigram
        (4, "   "),  # blank: no token at all
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bigram_lm_hand_computed(spark, corpus):
    # c12: (a,b)=3, (b,a)=1; context c1: a=3, b=1; V={a,b,z}=3
    # lp(a,b) = round(ln((3+1)/(3+3)) * 1e6) = -405465
    # lp(b,a) = round(ln((1+1)/(1+3)) * 1e6) = -693147
    got = {r.doc_id: r for r in bigram_lm_scores(corpus).collect()}
    lp_ab = round(math.log(4 / 6) * 1e6)
    lp_ba = round(math.log(2 / 4) * 1e6)
    assert (got[1].n_bigrams, got[1].lp_micro) == (3, 2 * lp_ab + lp_ba)
    assert (got[2].n_bigrams, got[2].lp_micro) == (1, lp_ab)
    assert got[1].ppl == round(math.exp(-got[1].lp_micro / 3e6), 6)
    assert got[2].ppl == round(math.exp(-lp_ab / 1e6), 6)
    # docs with < 2 tokens keep a 0/0 row with NULL perplexity
    assert (got[3].n_bigrams, got[3].lp_micro, got[3].ppl) == (0, 0, None)
    assert (got[4].n_bigrams, got[4].lp_micro, got[4].ppl) == (0, 0, None)


def test_bigram_lm_smoothing_normalizes(spark, corpus):
    # add-one over context counts: sum_w2 P(w2|w1) == 1 for every head
    # (c1 + V) in the denominator with V vocab entries in the numerator sum
    # -> exact by construction; checked through the micro values: the
    # UNSMOOTHED mass of observed bigrams is (c1)/(c1+V) < 1
    got = {r.doc_id: r for r in bigram_lm_scores(corpus).collect()}
    assert got[1].lp_micro < 0  # smoothed probs are < 1
    # duplicated content scores strictly better (less negative mean) than
    # the corpus's rarer transition: mean lp of d1 > lp(b,a) alone
    assert got[1].lp_micro / 3 > round(math.log(2 / 4) * 1e6)


def test_bigram_lm_plan_guard(spark, corpus):
    plan = bigram_lm_scores(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bigram_lm_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r.doc_id, r.n_bigrams, r.lp_micro, r.ppl)
        for r in bigram_lm_scores(docs).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(map(tuple, con.sql(bigram_lm_sql("documents")).fetchall()))
    assert got == want
    assert any(r[1] > 0 for r in got)  # the fixture corpus has real bigrams
