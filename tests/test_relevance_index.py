"""Inverted-index-backed BM25 (operators/relevance + Iceberg bucket[N]).

The contract: querying the bucketed posting-list table returns the SAME
rows as the direct corpus scan (bm25_scores), while reading only the
buckets the query terms hash into (manifest-pruned point lookups).
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from robosat_spark.operators.relevance import (
    bm25_from_index,
    bm25_scores,
    build_postings,
    write_inverted_index,
)
from robosat_spark.sources.iceberg import IcebergTable, write_iceberg

DOCS = "/root/testdata/sf0.001/documents.parquet"
TERMS = ["dup", "hash", "query", "stream"]


@pytest.fixture(scope="module")
def index_path(spark):
    path = os.path.join(tempfile.mkdtemp(prefix="robosat_bm25_idx_"), "idx")
    write_inverted_index(
        spark, spark.read.parquet(DOCS), path, n_buckets=8, timestamp_ms=1000
    )
    yield path
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def _rows(df):
    return sorted((r["doc_id"], r["score"]) for r in df.collect())


def test_index_query_matches_direct_scan(spark, index_path):
    docs = spark.read.parquet(DOCS)
    direct = _rows(bm25_scores(docs, TERMS))
    via_index = _rows(bm25_from_index(spark, index_path, TERMS))
    assert via_index == direct
    assert len(direct) > 0


def test_single_term_point_lookup_prunes_buckets(spark, index_path):
    t = IcebergTable(index_path)
    all_tasks, _ = t.plan_files()
    pruned, _ = t.plan_files(filters=[("token", "=", "dup")])
    assert len(all_tasks) >= 8  # one file per bucket at minimum
    assert len(pruned) < len(all_tasks) / 2  # point lookup hits ~1/N

    # and the pruned scan still yields the complete posting list
    got = {
        r["doc_id"]
        for r in t.scan(spark, filters=[("token", "=", "dup")]).collect()
    }
    want = {
        r["doc_id"]
        for r in build_postings(spark.read.parquet(DOCS))
        .filter(F.col("token") == "dup")
        .collect()
    }
    assert got == want and len(want) > 0


def test_summary_carries_exact_corpus_stats(spark, index_path):
    docs = spark.read.parquet(DOCS)
    summary = IcebergTable(index_path).snapshots()[-1]["summary"]
    n = docs.count()
    assert int(summary["bm25-n-docs"]) == n
    # total token count: replay the tokenizer
    from robosat_spark.operators.relevance import _doc_tokens

    sum_dl = docs.select(
        F.size(_doc_tokens(F.col("text"))).alias("dl")
    ).agg(F.sum("dl")).first()[0]
    assert int(summary["bm25-sum-dl"]) == sum_dl


def test_non_index_table_rejected(spark, tmp_path):
    path = str(tmp_path / "plain")
    write_iceberg(
        spark,
        spark.read.parquet(DOCS).limit(5),
        path,
        timestamp_ms=1000,
    )
    with pytest.raises(ValueError, match="not a BM25 index"):
        bm25_from_index(spark, path, ["dup"])


def test_empty_terms_rejected(spark, index_path):
    with pytest.raises(ValueError):
        bm25_from_index(spark, index_path, [])


def test_unknown_term_scores_nothing_known_terms_unaffected(spark, index_path):
    docs = spark.read.parquet(DOCS)
    got = _rows(bm25_from_index(spark, index_path, ["dup", "zzzznosuchtoken"]))
    want = _rows(bm25_scores(docs, ["dup", "zzzznosuchtoken"]))
    assert got == want


def test_compaction_preserves_index_queries_and_pruning(spark, index_path):
    """Compaction (REPLACE snapshot) must not break the index: the corpus
    stats live on an earlier snapshot, results stay bit-identical, and
    bucket point-lookup pruning still works on the rewritten files."""
    from robosat_spark.sources.iceberg import compact_table

    before = _rows(bm25_from_index(spark, index_path, TERMS))
    compact_table(spark, index_path, target_files=1)
    after = _rows(bm25_from_index(spark, index_path, TERMS))
    assert after == before

    t = IcebergTable(index_path)
    all_tasks, _ = t.plan_files()
    pruned, _ = t.plan_files(filters=[("token", "=", "dup")])
    assert len(pruned) < len(all_tasks)
