"""Checkpointed pipeline runner with per-partition lineage metrics (A11/K6).

The reference's resumability is ad-hoc: `rs download` skips tiles whose
output file exists (/root/reference/robosat/tools/download.py:48-49) and
`rs rasterize` max-merges onto pre-existing tiles
(/root/reference/robosat/tools/rasterize.py:131-133); training checkpoints
per epoch (/root/reference/robosat/tools/train.py:84-95,156-160). The engine
generalizes this into stage-level checkpointing (BASELINE.json north_rule:
"resumable from checkpoint with per-partition lineage + metrics"):

- every stage writes its output DataFrame to ``{root}/{stage}`` (parquet);
  Spark's atomic commit protocol provides the ``_SUCCESS`` marker;
- a rerun *skips* any stage whose ``_SUCCESS`` exists and reads the parquet
  back instead — idempotent resume at stage granularity, the distributed
  analog of skip-if-exists;
- after the commit, a ``{root}/_metrics/{stage}`` parquet records one row
  per output file-partition: (stage, partition_id, rows, wall_ms,
  upstream list) — lineage + row counts. Counting happens on the
  *written* files (parquet footer row counts via a count-star scan), so the
  stage computation is never executed twice.

At cluster scale this costs one metadata-only scan per stage and makes any
multi-stage job (cover -> rasterize -> features -> merge -> dedupe)
restartable after executor/driver loss without recomputing finished stages.
"""

from __future__ import annotations

import os
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "stage STRING, partition_id INT, rows LONG, wall_ms DOUBLE, upstream ARRAY<STRING>"
)


def _success_exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def stage_metrics(spark: SparkSession, root: str, stage: str | None = None) -> DataFrame:
    """Read back the lineage metrics for one stage (or all stages)."""
    base = os.path.join(root, "_metrics")
    path = os.path.join(base, stage) if stage else base + "/*"
    return spark.read.schema(METRICS_SCHEMA).parquet(path)


class Pipeline:
    """A DAG of named, checkpointed stages rooted at ``root``.

    Usage::

        p = Pipeline(spark, "/data/job1")
        masks = p.stage("masks", lambda: rasterize_masks(...), upstream=[])
        feats = p.stage("features", lambda: vectorize(masks), upstream=["masks"])

    Each ``stage`` call either computes+writes+measures, or (on resume)
    reads the committed parquet back. ``ran`` records which happened.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.ran: dict[str, bool] = {}

    def _out(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(
        self,
        name: str,
        fn: Callable[[], DataFrame],
        upstream: list[str] | None = None,
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        out = self._out(name)
        if _success_exists(out):
            self.ran[name] = False
            return self.spark.read.parquet(out)

        t0 = time.perf_counter()
        df = fn()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(out)
        wall_ms = (time.perf_counter() - t0) * 1000.0

        # per-partition lineage from the committed files: cheap count-star
        # over parquet footers, never a recompute of the stage body
        committed = self.spark.read.parquet(out)
        per_part = (
            committed.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .select(
                F.lit(name).alias("stage"),
                F.col("partition_id"),
                F.col("rows"),
                F.lit(wall_ms).alias("wall_ms"),
                F.array(*[F.lit(u) for u in (upstream or [])])
                .cast("array<string>")
                .alias("upstream"),
            )
        )
        per_part.write.mode("overwrite").parquet(os.path.join(self.root, "_metrics", name))
        self.ran[name] = True
        return self.spark.read.parquet(out)

    def invalidate(self, name: str) -> None:
        """Drop a stage's commit marker so the next run recomputes it."""
        marker = os.path.join(self._out(name), "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)

    def metrics(self) -> DataFrame:
        return stage_metrics(self.spark, self.root)
