"""Scan-parallelism fixup for small, unsplittable parquet inputs.

A parquet file is splittable only at row-group granularity; a small table
written as one file with one row group therefore scans as ONE task, and
every map-side operator chained on that scan (regex/geotag extraction,
shingling, md5 hashing, n-gram explodes) runs single-threaded no matter
how many cores the session has — measured on this suite as 8-core walls
== 32-core walls for the whole text stack (guide §2.5 "input skew: one
huge unsplittable file ... repartition immediately after the read").

``fan_out_small_scan`` repairs exactly that case, scale-adaptively:

- inputs LARGER than ``max_bytes`` (default 256 MB) are returned
  untouched — at production scale the scan has many row groups/files and
  Spark's own split planning (``spark.sql.files.maxPartitionBytes``)
  already yields parallelism; adding a shuffle there would be harmful;
- small inputs are round-robin repartitioned into ``bytes // per_part``
  partitions (floor 2, cap ``max_parts``): the floor keeps a partition
  big enough that JIT-warm codegen amortizes (measured: 64 partitions of
  ~1.5k rows ran ~50x slower per row than one warm task), the cap bounds
  task count at the level a 2 MB table can usefully spread.

The repartition is a plain round-robin exchange of the raw scan columns
(cheap by the size gate) and changes no row, so every downstream result
is identical; all consumers in this engine are order-independent by
design (value-deterministic aggregations, pinned sorts).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _input_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    try:
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    except OSError:
        return 0


def fan_out_small_scan(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    per_part: int = 64 << 10,
    max_parts: int = 16,
    max_bytes: int = 256 << 20,
) -> DataFrame:
    """Repartition a small single-file scan so downstream map work can
    use the cluster; no-op for production-scale inputs (see module doc)."""
    if os.environ.get("SPARK_GRAFT_NO_FANOUT"):  # measurement off-switch
        return df
    nbytes = _input_bytes(path)
    if nbytes == 0 or nbytes > max_bytes:
        return df
    cores = spark.sparkContext.defaultParallelism
    n = max(2, min(max_parts, cores, nbytes // per_part))
    return df.repartition(int(n))
