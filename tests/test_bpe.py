"""BPE merge training (operators/bpe): the classic textbook example,
overlapping pair counts, greedy one-pass merge semantics, whole-symbol
boundary safety, early stop, and DuckDB-twin parity on the real
documents table."""

import duckdb
import pytest

from robosat_spark.operators.bpe import (
    bpe_corpus_tokens,
    bpe_sql,
    bpe_tokens_sql,
    bpe_train,
    bpe_train_with_vocab,
    word_freqs,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, text):
    return spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")


def test_bpe_classic_example(spark):
    # Sennrich et al.'s low/lower/lowest walk-through: (l,o) ties (o,w)
    # at 4 and wins on lhs ASC; 'low' then absorbs e and r
    got = [tuple(r) for r in bpe_train(_docs(spark, "low lower lowest low"), 4)
           .orderBy("step").collect()]
    assert got == [
        (1, "l", "o", 4), (2, "lo", "w", 4), (3, "low", "e", 2), (4, "lowe", "r", 1),
    ]


def test_bpe_overlapping_count_and_greedy_merge(spark):
    # 'aaaa': round 1 counts (a,a) THREE times (overlapping, the standard
    # count) but the greedy one-pass apply yields [aa, aa] — proven by
    # round 2's top pair being (aa, aa); round 3 has no pair -> early stop
    got = [tuple(r) for r in bpe_train(_docs(spark, "aaaa"), 5).orderBy("step").collect()]
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_bpe_whole_symbol_boundary(spark):
    # after (a,b) merges, the symbol 'ab' is atomic: round 2 must pair
    # (c, ab) — a substring-level replace would have corrupted 'cab'
    got = [tuple(r) for r in bpe_train(_docs(spark, "ab cab"), 2).orderBy("step").collect()]
    assert got == [(1, "a", "b", 2), (2, "c", "ab", 1)]


def test_word_freqs_lowercased(spark):
    wf = {r.word: r.freq for r in word_freqs(_docs(spark, "The the THE cat")).collect()}
    assert wf == {"the": 3, "cat": 1}


def test_bpe_corpus_tokens_apply(spark):
    # after (l,o)(lo,w)(low,e)(lowe,r): low -> 1 sym, lower -> 1, lowest -> 3
    # n_words = 2 + 1 + 1; n_tokens = 2*1 + 1*1 + 1*3
    _, enc = bpe_train_with_vocab(_docs(spark, "low lower lowest low"), 4)
    row = bpe_corpus_tokens(enc).collect()[0]
    assert (row.n_words, row.n_tokens) == (4, 6)
    con = duckdb.connect()
    con.sql("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.sql("INSERT INTO d VALUES (1, 'low lower lowest low')")
    assert con.sql(bpe_tokens_sql("d", 4)).fetchall() == [(4, 6)]


def test_bpe_duckdb_twin_parity(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(tuple(r) for r in bpe_train(docs, n_merges=6).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(map(tuple, con.sql(bpe_sql("documents", 6)).fetchall()))
    assert got == want
    assert len(got) == 6
