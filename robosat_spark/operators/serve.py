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


def serve_tile_png(
    grids: DataFrame, z: int, x: int, y: int, palette: list[int] | None = None
) -> bytes | None:
    """The full `rs serve` response analog: partition-pruned lookup ->
    palette PNG bytes (serve.py:50-69 returns send_file(png); here the
    bytes come from the from-scratch kernels.png encoder)."""
    import numpy as np

    from ..kernels.png import encode_png

    row = lookup_tile(grids, z, x, y)
    if row is None:
        return None
    grid = np.frombuffer(row["data"], dtype=np.uint8).reshape(row["h"], row["w"])
    return encode_png(grid, palette=palette)
