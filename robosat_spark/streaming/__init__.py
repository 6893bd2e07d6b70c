"""Structured-Streaming surface (SURVEY.md §2.10 — engine extension)."""

from .ingest import (  # noqa: F401
    PAGES_SCHEMA,
    streaming_pages,
    streaming_tile_counts,
    streaming_latest_snapshot,
)
