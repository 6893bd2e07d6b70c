"""Structured-Streaming surface (SURVEY.md §2.10 — engine extension)."""

from .ingest import (  # noqa: F401
    PAGES_SCHEMA,
    streaming_cms_registers,
    streaming_hist_registers,
    streaming_hll_registers,
    streaming_latest_snapshot,
    streaming_pages,
    streaming_tile_counts,
)
