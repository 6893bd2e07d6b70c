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

from pyspark.sql import DataFrame
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
