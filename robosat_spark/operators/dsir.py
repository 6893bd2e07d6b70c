"""DSIR — data selection via importance resampling (Xie et al. 2023).

The data-selection primitive of an LLM pipeline: score every raw-corpus
document by how much more likely its hashed n-gram features are under a
TARGET distribution (the data you want more of) than under the SOURCE
distribution (the raw corpus), then keep the target-leaning documents.
Engine extra — the reference has no text pipeline.

Model: features are word unigrams + bigrams hashed into ``n_buckets``
buckets (md5-based, engine-replayable); both distributions are add-one
bucket multinomials. The per-document log importance weight is

    log w(d) = sum_b c_b(d) * (ln p_target[b] - ln p_source[b])

Cross-engine exactness: the per-bucket log-ratio rounds to int64
MICRO-units before any sum (the lm.py / PageRank fixed-point
discipline), so per-doc aggregates are order-independent integer
arithmetic and the DuckDB twin matches bit-for-bit.

Scale shape: the feature explode is computed ONCE and locally
checkpointed (r7) — its two consumers (a SINGLE conditional aggregation
producing BOTH distributions map-side-combined, and the per-doc probe)
read the materialized triples instead of each replaying the md5 gram
hashing; the bucket table is ``n_buckets``-bounded so its joins
broadcast, and the (T, S) totals attach as a 1-row broadcast hash join
on a data-derived pmod key (a lit key would constant-fold into the BNLJ
cross the plan guard forbids).
Every bucket a document can probe appears in the source table by
construction (the source is the whole corpus), so the probe join is an
inner equi-join with no miss path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MICRO = 1e6


def _feat_buckets(text: Column, n_buckets: int) -> Column:
    """Hashed unigram+bigram feature buckets (with multiplicity) of a
    document: md5-based 60-bit hash mod n_buckets. Unigrams never
    contain whitespace, so space-joined bigrams cannot collide with
    them pre-hash."""
    from ..functions.text import WS_RUN
    from .dedup import word_ngrams_from_words

    w = F.filter(F.split(F.trim(F.lower(text)), WS_RUN), lambda x: x != "")
    bigrams = F.when(F.size(w) >= 2, word_ngrams_from_words(w, 2)).otherwise(
        F.array().cast("array<string>")
    )
    grams = F.concat(w, bigrams)
    return F.transform(
        grams,
        lambda g: F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """-> (doc_id, n_feats, logw_micro, selected): per-document hashed
    n-gram importance weight of target-vs-source, in int64 micro-units;
    ``selected`` is the natural keep rule logw_micro > 0 (more likely
    under the target than the source). Documents with no feature keep a
    0/0/false row."""
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("is_target"),
        _feat_buckets(F.col(text_col), n_buckets).alias("bks"),
    )
    fb = base.select("doc_id", "is_target", F.explode("bks").alias("b"))
    # materialize the hashed-feature explode ONCE (r7, guide §3.3/§5):
    # both the distribution aggregation and the per-doc probe consume it,
    # and without the cut Catalyst replays the md5 hashing of every gram
    # per consumer (measured -22% at sf0.1). The pre-checkpoint pipeline
    # is pure map-side (scan -> explode), so the lazy RDD materialization
    # loses no join/AQE planning; storage is the (doc_id, bool, bucket)
    # triple per feature — the same corpus-tokens class as the shingle
    # checkpoint minhash_lsh_pairs already pins, spilling to local disk.
    fb = fb.localCheckpoint(eager=False)
    # ONE conditional aggregation produces both distributions (a separate
    # filtered agg would make Catalyst replay the corpus-scale feature
    # explode a second time for the target side — plan-audited)
    counts = fb.groupBy("b").agg(
        F.count("*").alias("s_b"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t_b"),
    )
    # (S, T) totals as a constant-partition window over the B-row counts
    # table (≤ n_buckets rows in one partition — cheap by construction); a
    # counts.agg() + re-join would replay the corpus explode a third time
    from pyspark.sql.window import Window

    w_all = Window.partitionBy(F.lit(0))
    delta = (
        counts.withColumn("s_total", F.sum("s_b").over(w_all))
        .withColumn("t_total", F.sum("t_b").over(w_all))
        .select(
            "b",
            F.round(
                (
                    F.log((F.col("t_b") + 1) / (F.col("t_total") + n_buckets))
                    - F.log((F.col("s_b") + 1) / (F.col("s_total") + n_buckets))
                )
                * F.lit(_MICRO)
            )
            .cast("long")
            .alias("d1"),
        )
    )
    perdoc = (
        fb.groupBy("doc_id", "b")
        .agg(F.count("*").alias("c"))
        .join(delta, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("d1")).alias("logw_micro"),
        )
    )
    return base.select("doc_id").join(perdoc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("logw_micro", F.lit(0)).cast("long").alias("logw_micro"),
        (F.coalesce("logw_micro", F.lit(0)) > 0).alias("selected"),
    )


def dsir_sql(docs_rel: str, target_sql: str, n_buckets: int = 1024) -> str:
    """DuckDB twin of :func:`dsir_weights` over ``docs_rel`` (needs
    doc_id, text + whatever ``target_sql`` references): identical
    tokenizer class, bucket hash, smoothing, and micro fixed-point.
    ``target_sql`` is a boolean SQL expression naming the target set."""
    from ..functions.text import WS_CLASS

    ws = WS_CLASS + "+"
    return f"""
        WITH base AS (
            SELECT doc_id, ({target_sql}) AS is_target,
                   list_filter(regexp_split_to_array(trim(lower(text)), '{ws}'),
                               x -> x <> '') AS w
            FROM {docs_rel}
        ),
        grams AS (
            SELECT doc_id, is_target, w[i] AS g FROM base,
                 UNNEST(generate_series(1, len(w))) AS u(i)
            UNION ALL
            SELECT doc_id, is_target, w[i] || ' ' || w[i + 1] AS g FROM base,
                 UNNEST(generate_series(1, len(w) - 1)) AS u(i)
            WHERE len(w) >= 2
        ),
        fb AS (
            SELECT doc_id, is_target,
                   ('0x' || substr(md5(g), 1, 15))::BIGINT % {n_buckets} AS b
            FROM grams
        ),
        src AS (SELECT b, count(*) AS s_b FROM fb GROUP BY b),
        tgt AS (SELECT b, count(*) AS t_b FROM fb WHERE is_target GROUP BY b),
        tot AS (SELECT (SELECT CAST(sum(s_b) AS BIGINT) FROM src) AS s_total,
                       (SELECT COALESCE(CAST(sum(t_b) AS BIGINT), 0) FROM tgt) AS t_total),
        delta AS (
            SELECT b,
                   CAST(round((ln((COALESCE(t_b, 0) + 1) / (t_total + {n_buckets}))
                             - ln((s_b + 1) / (s_total + {n_buckets}))) * 1e6, 0)
                        AS BIGINT) AS d1
            FROM src LEFT JOIN tgt USING (b), tot
        ),
        perdoc AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
                   CAST(sum(c * d1) AS BIGINT) AS logw_micro
            FROM (SELECT doc_id, b, count(*) AS c FROM fb GROUP BY doc_id, b)
            JOIN delta USING (b) GROUP BY doc_id
        )
        SELECT base.doc_id,
               COALESCE(p.n_feats, 0) AS n_feats,
               COALESCE(p.logw_micro, 0) AS logw_micro,
               COALESCE(p.logw_micro, 0) > 0 AS selected
        FROM base LEFT JOIN perdoc p USING (doc_id)
    """
