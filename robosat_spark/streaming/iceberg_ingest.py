"""Checkpointed incremental consumption of an Iceberg table.

The production ingest loop the north rule implies: pages land in the
Iceberg table as append snapshots; the pipeline consumes exactly the
rows added since its last committed cursor. PySpark cannot register a
custom DataSource-v2 stream without a JVM-side jar, so the micro-batch
driver loop is explicit — the same shape Structured Streaming's
``Trigger.AvailableNow`` executes internally, with the cursor file
playing the role of the checkpoint offset log:

    cursor = IcebergCursor(table_path, cursor_dir)
    n = cursor.poll(spark, lambda df, snap_id: sink(df))  # consume new snaps

Semantics: ``process`` runs BEFORE the cursor advances, so a crash
between the two replays the batch — at-least-once, upgraded to
effectively-once when the sink is idempotent (every sink in
``sources/sinks.py`` is: tmp-then-rename files, overwrite parquet,
skip-existing download). The cursor write itself is atomic
(tmp + ``os.replace``). Snapshot isolation comes from the table: an
in-flight append publishes its manifest list only at metadata commit,
so a poll never sees a torn snapshot.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable

from ..sources.iceberg import IcebergTable


class IcebergCursor:
    """Durable consumption cursor over an Iceberg table's snapshot log."""

    def __init__(self, table_path: str, cursor_dir: str):
        self.table_path = table_path
        self.cursor_dir = cursor_dir
        os.makedirs(cursor_dir, exist_ok=True)
        self._file = os.path.join(cursor_dir, "iceberg-cursor.json")

    def position(self) -> int:
        """Last fully-processed snapshot id (0 = nothing consumed)."""
        if not os.path.exists(self._file):
            return 0
        with open(self._file) as f:
            return int(json.load(f)["snapshot_id"])

    def _commit(self, snapshot_id: int) -> None:
        tmp = self._file + f".tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": snapshot_id, "table": self.table_path}, f)
        os.replace(tmp, self._file)

    def poll(self, spark, process: Callable, max_snapshots: int | None = None) -> int:
        """Consume snapshots newer than the cursor, one micro-batch per
        snapshot (ordered). ``process(df, snapshot_id)`` runs before the
        cursor advances past that snapshot. Returns #snapshots consumed."""
        table = IcebergTable(self.table_path)
        start = self.position()
        new = sorted(
            (s for s in table.snapshots() if s["snapshot-id"] > start),
            key=lambda s: s["snapshot-id"],
        )
        if max_snapshots is not None:
            new = new[:max_snapshots]
        consumed = 0
        prev = start
        for snap in new:
            snap_id = snap["snapshot-id"]
            if snap.get("summary", {}).get("operation") in ("replace", "delete"):
                # replace (compaction rewrite: same logical rows) and delete
                # (position tombstones: no NEW rows) snapshots add nothing
                # to an append-stream consumer — advance the cursor without
                # emitting a batch (else every compaction would replay the
                # whole table)
                self._commit(snap_id)
                prev = snap_id
                continue
            df = table.scan_incremental(spark, from_snapshot_id=prev, to_snapshot_id=snap_id)
            process(df, snap_id)
            self._commit(snap_id)
            prev = snap_id
            consumed += 1
        return consumed


def last_committed_batch(table_path: str, query_id: str) -> int | None:
    """Highest streaming batch id a snapshot of ``table_path`` records
    for ``query_id`` (None when the table is absent or this query never
    committed). Metadata-only — no data files are touched."""
    from ..sources.iceberg import current_version

    if current_version(table_path) < 1:
        return None
    best = None
    for s in IcebergTable(table_path).snapshots():
        summ = s.get("summary", {})
        if summ.get("streaming-query-id") != query_id:
            continue
        b = int(summ["streaming-batch-id"])
        best = b if best is None or b > best else best
    return best


def iceberg_batch_sink(table_path: str, query_id: str = "stream", **write_kwargs):
    """Exactly-once ``foreachBatch`` sink into an Iceberg table:

        (df.writeStream.foreachBatch(iceberg_batch_sink(path))
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True).start())

    Structured Streaming's contract is at-least-once delivery to
    ``foreachBatch`` — after a crash between the sink's table commit and
    the checkpoint's batch commit, the SAME batch id replays. The sink
    upgrades that to exactly-once the way the reference Iceberg Spark
    sink does: every snapshot it commits records (query id, batch id) in
    the snapshot summary, and a batch at or below the query's last
    committed id is a replay — skipped without reading the batch. The
    skip check is metadata-only, so a restart costs one snapshot-log
    read, never a table scan.

    ``write_kwargs`` pass through to ``write_iceberg`` (``partition_by``,
    ``partition_transform='bucket[N]'``, ``stats_cols`` — a streamed
    table gets the same keyed layout and file stats as a batch-written
    one). Multiple independent streams may share a table under distinct
    ``query_id`` values; concurrent WRITERS are not coordinated (one
    stream per table at a time, the module's single-writer assumption).
    Empty batches commit nothing (replaying one is naturally idempotent).
    """
    from ..sources.iceberg import write_iceberg

    def write_batch(batch_df, batch_id: int) -> None:
        done = last_committed_batch(table_path, query_id)
        if done is not None and batch_id <= done:
            return
        if not batch_df.take(1):
            return
        write_iceberg(
            batch_df.sparkSession, batch_df, table_path,
            summary_extra={"streaming-query-id": query_id,
                           "streaming-batch-id": batch_id},
            **write_kwargs,
        )

    return write_batch
