"""The end-to-end corpus-curation DAG, composed from the engine's text
operators under the checkpointed Pipeline runner (plans/pipeline.py).

One call runs the whole training-data preparation flow a 100 TB corpus
goes through, with stage-level resume — a driver loss costs at most one
stage, and `_metrics/` records per-partition lineage for every stage:

    raw documents
      -> quality      (PII-redacted text, quality/lang columns; low-quality
                       docs dropped)
      -> dedup        (exact: one survivor per md5 fingerprint, min doc_id)
      -> linecut      (corpus-wide duplicated LINES removed — boilerplate)
      -> spancut      (corpus-wide duplicated word-5-gram SPANS cut,
                       Lee-et-al. ExactSubstr)
      -> scored       (bigram-LM perplexity over the CLEANED corpus)
      -> curated      (the release table: cleaned text + quality + ppl)
      -> packed       (chunked + sequence-packed training shards)

Stage order matters: line-cut runs BEFORE span-cut because the span cut
reassembles tokens with single spaces (newlines don't survive it), and
the LM trains on the cleaned corpus so boilerplate/duplicated passages
don't dominate its counts. Every stage is a pure DataFrame function of
the previous stage's parquet — rerunning the pipeline skips every
committed stage (`_SUCCESS`-gated); `Pipeline.invalidate(stage)`
forces exactly that stage to recompute on the next run (downstream
stages keep their commits — invalidate them too when the change must
propagate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .pipeline import Pipeline


def curate_corpus(
    spark: SparkSession,
    docs_path: str,
    root: str,
    min_quality: float = 0.3,
    chunk_tokens: int = 64,
    overlap: int = 16,
    seq_tokens: int = 256,
    input_kind: str = "parquet",
) -> Pipeline:
    """Run (or resume) the curation DAG over ``docs_path`` rooted at
    ``root``; returns the Pipeline (stage outputs under ``root/<stage>``,
    which-ran flags in ``.ran``, lineage in ``root/_metrics``).
    ``input_kind='wet'`` reads raw WARC/WET crawl archives instead of a
    documents parquet — the whole crawl-to-training-shards flow in one
    resumable run."""
    from ..functions.text import lang_id, quality_score, redact_pii
    from ..operators.chunking import chunk_documents, pack_chunks
    from ..operators.dedup import remove_duplicate_lines, remove_duplicate_spans
    from ..operators.lm import bigram_lm_scores

    p = Pipeline(spark, root)

    def _read():
        if input_kind == "wet":
            from ..sources.warc import documents_from_wet

            return documents_from_wet(spark, docs_path)
        return spark.read.parquet(docs_path)

    quality = p.stage(
        "quality",
        lambda: (
            _read()
            .select(
                "doc_id",
                redact_pii(F.col("text")).alias("text"),
                F.round(quality_score(F.col("text")), 6).alias("quality"),
                lang_id(F.col("text")).alias("lang_pred"),
            )
            .filter(F.col("quality") >= min_quality)
        ),
        upstream=[],
    )

    dedup = p.stage(
        "dedup",
        lambda: (
            quality.withColumn("fp", F.md5("text"))
            .withColumn(
                "keep",
                F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")) == 1,
            )
            .filter("keep")
            .drop("fp", "keep")
        ),
        upstream=["quality"],
    )

    linecut = p.stage(
        "linecut",
        lambda: remove_duplicate_lines(dedup)
        .join(dedup.select("doc_id", "quality", "lang_pred"), "doc_id")
        .select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "quality",
            "lang_pred",
            F.col("n_lines_removed").alias("n_lines_cut"),
        ),
        upstream=["dedup"],
    )

    spancut = p.stage(
        "spancut",
        lambda: remove_duplicate_spans(linecut)
        .join(linecut.select("doc_id", "quality", "lang_pred", "n_lines_cut"), "doc_id")
        .select(
            "doc_id",
            F.col("clean_text").alias("text"),
            "quality",
            "lang_pred",
            "n_lines_cut",
            F.col("n_tokens_removed").alias("n_tokens_cut"),
        ),
        upstream=["linecut"],
    )

    scored = p.stage(
        "scored",
        lambda: bigram_lm_scores(spancut),
        upstream=["spancut"],
    )

    curated = p.stage(
        "curated",
        lambda: spancut.join(
            scored.select("doc_id", "n_bigrams", "ppl"), "doc_id"
        ).filter(F.length(F.trim("text")) > 0),
        upstream=["spancut", "scored"],
    )

    p.stage(
        "packed",
        lambda: pack_chunks(
            chunk_documents(curated, chunk_tokens=chunk_tokens, overlap=overlap),
            seq_tokens=seq_tokens,
        ),
        upstream=["curated"],
    )
    return p
