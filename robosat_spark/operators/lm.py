"""Corpus-trained bigram language-model scoring (CCNet-class quality signal).

A training-data pipeline buckets documents by how "fluent" they look under
a cheap language model trained on the corpus itself (CCNet, Wenzek et al.
2020, uses a KenLM 5-gram; the bigram member is the same signal at the
granularity a shuffle engine expresses without backoff tables). Engine
extra — the reference has no text pipeline; its closest analog is
per-tile probability ranking (robosat/tools/masks.py).

Model: add-one-smoothed bigram LM over lowercased whitespace tokens,

    P(w2 | w1) = (c(w1,w2) + 1) / (c1(w1) + V)

with c1 the CONTEXT count (occurrences of w1 as a bigram head, so the
conditional sums to 1 over the smoothed vocab) and V the corpus distinct
token count. Per-document output is the summed log-probability and the
per-token perplexity exp(-mean logprob).

Cross-engine exactness: every per-bigram log-probability is rounded to
integer MICRO-units (round(ln(p) * 1e6) as int64) before any sum, so the
per-document aggregate is order-independent integer arithmetic — the same
fixed-point discipline as the PageRank operator — and the DuckDB twin
matches bit-for-bit. Only the final readout (one exp per doc, rounded to
6 decimals) is floating point.

Scale shape: the bigram explode is evaluated ONCE and locally
checkpointed (r7 — lazy, spills to executor-local disk; its two
consumers, the count table and the per-doc probe, previously replayed
the corpus explode per consumer) — plus
one token pass for the vocab size; context counts ride a window over
the vocab²-bounded bigram-count table instead of a third corpus pass
(plan-audited). Count tables join back on equi-keys (AQE may broadcast
them when small — never forced); V attaches as a 1-row broadcast hash
join on a data-derived pmod key (a lit key would constant-fold the
join into the BNLJ cross the repo's plan guard forbids). No driver
collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MICRO = 1e6


def _toks(text: Column) -> Column:
    from ..functions.text import WS_RUN

    return F.filter(F.split(F.trim(F.lower(text)), WS_RUN), lambda x: x != "")


def bigram_lm_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, n_bigrams, lp_micro, ppl): add-one bigram LM trained on
    ``docs`` and scored back over every document. ``lp_micro`` is the
    int64 sum of per-bigram round(ln(P) * 1e6); ``ppl`` the per-token
    perplexity round(exp(-lp_micro / (1e6 * n_bigrams)), 6), NULL for
    documents with fewer than two tokens (which keep a 0/0 row)."""
    base = docs.select(F.col(id_col).alias("doc_id"), _toks(F.col(text_col)).alias("toks"))
    n = F.size("toks")
    pairs = F.when(
        n >= 2,
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    # materialize the bigram explode ONCE (r7, guide §3.3/§5): the count
    # table and the per-doc probe both consume it, and without the cut
    # Catalyst replays the corpus explode per consumer. The pre-checkpoint
    # pipeline is pure map-side (scan -> zip_with -> explode), so the lazy
    # RDD materialization loses no join planning; storage is the
    # (doc_id, w1, w2) triple per bigram — the corpus-tokens class the
    # minhash shingle checkpoint already pins, spilling to local disk.
    bg = bg.localCheckpoint(eager=False)
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    # context counts as a window over the vocab²-bounded c12 table — a
    # groupBy-then-join on c12 would make Catalyst recompute the whole
    # corpus explode a second time for the same numbers (plan-audited);
    # the window shuffles only the small count table
    from pyspark.sql.window import Window

    c1 = F.sum("c12").over(Window.partitionBy("w1"))
    vocab = base.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    # 1-row V attach: data-derived constant key -> stays a broadcast hash
    # join (see relevance.bm25_scores for the lit-key anti-fold rationale)
    _k = lambda c: F.pmod(F.hash(c), F.lit(1))
    lp = (
        c12.withColumn("c1", c1)
        .withColumn("__k", _k(F.col("w1")))
        .join(F.broadcast(vocab.withColumn("__k", _k(F.col("v")))), "__k")
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))) * F.lit(_MICRO)
            )
            .cast("long")
            .alias("lp1"),
        )
    )
    perdoc = (
        bg.groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").alias("dn"))
        .join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("dn").alias("n_bigrams"),
            F.sum(F.col("dn") * F.col("lp1")).alias("lp_micro"),
        )
    )
    return base.select("doc_id").join(perdoc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
        F.coalesce("lp_micro", F.lit(0)).cast("long").alias("lp_micro"),
        F.when(
            F.col("n_bigrams") > 0,
            F.round(
                F.exp(-F.col("lp_micro") / (F.lit(_MICRO) * F.col("n_bigrams"))), 6
            ),
        ).alias("ppl"),
    )


def bigram_lm_sql(docs_rel: str) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` over ``docs_rel`` (needs
    doc_id, text): identical tokenizer class, context counts, micro
    fixed-point rounding, and final readout. Explicit BIGINT casts keep
    DuckDB's HUGEINT sums off the wire (the driver hashes dtypes)."""
    from ..functions.text import WS_CLASS

    ws = WS_CLASS + "+"
    return f"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(lower(text)), '{ws}'),
                               x -> x <> '') AS toks
            FROM {docs_rel}
        ),
        bg AS (
            SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
            FROM base, UNNEST(generate_series(1, len(toks) - 1)) AS t(i)
            WHERE len(toks) >= 2
        ),
        c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
        c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
        v AS (SELECT count(DISTINCT w) AS v
              FROM (SELECT unnest(toks) AS w FROM base)),
        lp AS (
            SELECT w1, w2,
                   CAST(round(ln((c12 + 1) / (c1 + v)) * 1e6, 0) AS BIGINT) AS lp1
            FROM c12 JOIN c1 USING (w1), v
        ),
        dbg AS (SELECT doc_id, w1, w2, count(*) AS dn
                FROM bg GROUP BY doc_id, w1, w2),
        agg AS (
            SELECT doc_id, CAST(sum(dn) AS BIGINT) AS n_bigrams,
                   CAST(sum(dn * lp1) AS BIGINT) AS lp_micro
            FROM dbg JOIN lp USING (w1, w2) GROUP BY doc_id
        )
        SELECT b.doc_id,
               COALESCE(a.n_bigrams, 0) AS n_bigrams,
               COALESCE(a.lp_micro, 0) AS lp_micro,
               CASE WHEN a.n_bigrams > 0
                    THEN round(exp(-a.lp_micro / (1e6 * a.n_bigrams)), 6)
               END AS ppl
        FROM base b LEFT JOIN agg a USING (doc_id)
    """
