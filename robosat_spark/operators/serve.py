"""Point lookups over tile-keyed tables (P3, the serve-tool analog).

The reference's `rs serve` is a single-threaded Flask proof of concept
(/root/reference/robosat/tools/serve.py:24-34) doing fetch->segment->PNG
per /z/x/y request. The batch engine's analog is a keyed point lookup: on a
slippy-layout dataset (partitioned by z, x — sources.sinks.write_slippy_grids)
the filter prunes to one directory partition and reads one footer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_tile(grids: DataFrame, z: int, x: int, y: int):
    """-> the (w, h, data) row for one tile, or None. Partition-pruned on
    z/x when the dataset is written with the slippy layout."""
    rows = (
        grids.filter((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
        .select("w", "h", "data")
        .limit(1)
        .collect()
    )
    return rows[0] if rows else None
