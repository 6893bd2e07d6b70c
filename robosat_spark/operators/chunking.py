"""Fixed-window document chunking with overlap.

The tokenize-and-window step every LLM training pipeline runs between
curation and tokenizer packing: each document becomes ceil-many windows
of ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens -
overlap``, so consecutive chunks share ``overlap`` tokens of context.
Analog of the reference's overlapping tile windows (robosat buffers
tiles by ``overlap`` pixels before prediction, robosat/tiles.py) — same
idea, token axis instead of pixels.

Pure map-side codegen: split -> sequence -> explode -> slice. No
shuffle at any corpus size; 100 TB of chunks stream straight from the
scan to the sink, and the chunk boundaries depend only on the document
itself (stable across reruns, partitioning, and cluster size). The
DuckDB oracle twin replays identical windows via generate_series +
list slicing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """-> one row per (document, window): ``id_col``, ``chunk_idx``
    (0-based), ``n_chunks``, ``chunk_len`` (tokens in this window —
    only the last window may be short), ``chunk_text`` (space-joined).
    A document at or under ``chunk_tokens`` tokens is one chunk
    (possibly empty text -> one empty chunk, kept so every input doc
    stays accounted for downstream)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got {overlap} / {chunk_tokens}"
        )
    from ..functions.text import WS_RUN

    step = chunk_tokens - overlap
    toks = F.filter(F.split(F.trim(F.col(text_col)), WS_RUN), lambda x: x != "")
    dl = F.size("__toks")
    n_chunks = (
        F.when(dl <= chunk_tokens, F.lit(1).cast("long"))
        .otherwise(
            F.ceil((dl - F.lit(chunk_tokens)).cast("double") / F.lit(float(step))) + 1
        )
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_idx") * step + 1, chunk_tokens
    )
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(
            id_col, "__toks", n_chunks.alias("n_chunks"),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col, "chunk_idx", "n_chunks",
            F.size(window).alias("chunk_len"),
            F.array_join(window, " ").alias("chunk_text"),
        )
    )


def pack_chunks(
    chunks: DataFrame,
    seq_tokens: int = 256,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    len_col: str = "chunk_len",
    bucket_docs: int = 4096,
    max_buckets: int = 4096,
    id_bounds: DataFrame | None = None,
) -> DataFrame:
    """Sequence packing — the step after chunking in a training-data
    pipeline: lay every chunk head-to-tail in global (``id_col``,
    ``idx_col``) order and cut the token stream every ``seq_tokens``,
    so each chunk knows its absolute token offset and which training
    sequence(s) it lands in.

    Adds to ``chunks``: ``tok_offset`` (global tokens before this
    chunk), ``seq_first`` / ``seq_last`` (the packed-sequence ids this
    chunk touches; a chunk straddling a cut has seq_last > seq_first).
    All-integer arithmetic — deterministic at any parallelism.

    Scale shape: a global running sum, WITHOUT a single-partition
    window over the data. Two-phase distributed prefix sum: (1) bucket
    rows by ``id_col DIV width`` — truncating DIV is monotone for ANY
    int64 ids (negative included), so bucket id stays the ordering
    key's major component; (2) a window cumsum over the bounded bucket
    table broadcasts back as per-bucket offsets; (3) the within-bucket
    cumsum window partitions by bucket — fully distributed.

    ``width`` adapts to the ID RANGE (r7, ADVICE fix): a fixed
    ``id_col DIV bucket_docs`` was right for dense ids but sent
    xxhash64-style sparse ids (uniform over the whole int64 range —
    what the curation DAG feeds) into ~one bucket PER DOC, collapsing
    phase (2) into a single-partition window over ~N rows. Now
    ``width = max(bucket_docs, range // max_buckets + 1)`` (computed
    DIV-first so full-range ids cannot overflow), keeping the bucket
    table <= ~max_buckets rows for dense AND hashed ids while leaving
    dense-id bucketing byte-identical to the old rule. The id bounds
    are one metadata-scale driver aggregate (the pagerank node-count
    convention); pass ``id_bounds`` (any frame whose ``id_col`` spans
    the same ids, e.g. the documents table) to read them off parquet
    stats instead of a second pass over the chunk lineage."""
    src = chunks if id_bounds is None else id_bounds
    row = src.agg(F.min(id_col).alias("mn"), F.max(id_col).alias("mx")).collect()[0]
    mn = 0 if row["mn"] is None else int(row["mn"])
    mx = 0 if row["mx"] is None else int(row["mx"])
    tdiv = lambda a, b: -(-a // b) if a < 0 else a // b  # noqa: E731 — truncating DIV
    width = max(int(bucket_docs), tdiv(mx, int(max_buckets)) - tdiv(mn, int(max_buckets)) + 1)
    ch = chunks.withColumn("__bkt", F.expr(f"{id_col} DIV {width}"))
    bsums = ch.groupBy("__bkt").agg(F.sum(len_col).alias("__bsum"))
    w_b = Window.orderBy("__bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = bsums.select(
        "__bkt",
        F.coalesce(F.sum("__bsum").over(w_b), F.lit(0)).cast("long").alias("__boff"),
    )
    w_in = (
        Window.partitionBy("__bkt")
        .orderBy(id_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(len_col).over(w_in), F.lit(0)).cast("long")
    out = (
        ch.join(F.broadcast(offs), "__bkt")
        .withColumn("tok_offset", (F.col("__boff") + local).cast("long"))
        .withColumn("seq_first", F.expr(f"tok_offset DIV {int(seq_tokens)}"))
        .withColumn(
            # a zero-length chunk sitting exactly on a cut would compute
            # (off - 1) DIV S = seq_first - 1; clamp to seq_first
            "seq_last",
            F.greatest(
                F.col("seq_first"),
                F.expr(f"(tok_offset + {len_col} - 1) DIV {int(seq_tokens)}"),
            ),
        )
    )
    return out.drop("__bkt", "__boff")


def pack_sql(chunks_rel: str, seq_tokens: int = 256) -> str:
    """DuckDB twin of :func:`pack_chunks` over a relation producing
    (doc_id, chunk_idx, chunk_len, ...): the two-phase prefix sum
    collapses to one global ordered window — same integer arithmetic,
    bit-identical offsets and sequence ids."""
    s = int(seq_tokens)
    return f"""
        SELECT *,
               CAST(tok_offset // {s} AS BIGINT) AS seq_first,
               CAST(GREATEST(tok_offset // {s},
                             (tok_offset + chunk_len - 1) // {s}) AS BIGINT)
                   AS seq_last
        FROM (
          SELECT *,
                 CAST(COALESCE(SUM(chunk_len) OVER (
                          ORDER BY doc_id, chunk_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS tok_offset
          FROM ({chunks_rel})
        )
    """


def chunks_sql(docs_rel: str, chunk_tokens: int = 64, overlap: int = 16) -> str:
    """DuckDB twin of :func:`chunk_documents` over ``docs_rel`` (needs
    doc_id, text): same tokenizer class, window arithmetic, and joins."""
    from ..functions.text import WS_CLASS

    step = chunk_tokens - overlap
    # WS_CLASS ships verbatim (escape sequences read identically by Java
    # and RE2); scalar-list generate_series + unnest because DuckDB's
    # table-function form takes no lateral column arguments
    ws = WS_CLASS + "+"
    return f"""
        WITH tk AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(trim(text), '{ws}'),
                               x -> x <> '') AS toks
            FROM {docs_rel}
        ),
        n AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) <= {chunk_tokens} THEN 1
                        ELSE CAST(ceil((len(toks) - {chunk_tokens}) / {float(step)!r})
                             AS BIGINT) + 1 END AS n_chunks
            FROM tk
        ),
        ch AS (
            SELECT doc_id, toks, n_chunks,
                   unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
            FROM n
        )
        SELECT doc_id, chunk_idx, n_chunks,
               len(toks[chunk_idx*{step}+1 : chunk_idx*{step}+{chunk_tokens}])
                   AS chunk_len,
               array_to_string(
                   toks[chunk_idx*{step}+1 : chunk_idx*{step}+{chunk_tokens}], ' ')
                   AS chunk_text
        FROM ch
    """
