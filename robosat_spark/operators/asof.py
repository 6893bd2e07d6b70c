"""As-of (point-in-time) join: each left row matched to the latest right
row of the same key at or before the left timestamp.

The reference's nearest analog is skip-if-exists idempotency — "use the
newest state available at this moment"
(/root/reference/robosat/tools/download.py:48-49); SURVEY §2.5 lists as-of
as the interval-join member of the engine's join-type matrix.

Plan shape: equi-join on the key with the temporal predicate as a join
condition, then a rank window keeps the newest right row per left row —
Catalyst plans the equi part as a hash join, so cost is O(key-matches),
not a theta product. Deterministic tie-break: (right_ts DESC, right_id
DESC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_id: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    how: str = "inner",
) -> DataFrame:
    """-> left columns + matched right columns aliased ``r_*``.

    ``left_id`` must uniquely identify left rows (the window partition).
    ``how='left'`` keeps unmatched left rows with null right columns."""
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__rts"),
        F.col(right_id).alias("__rid"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    joined = left.join(
        r, (left[key] == F.col("__k")) & (F.col("__rts") <= left[left_ts]), how
    )
    w = Window.partitionBy(left[left_id]).orderBy(
        F.col("__rts").desc_nulls_last(), F.col("__rid").desc_nulls_last()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__k", "__rts", "__rid")
    )
