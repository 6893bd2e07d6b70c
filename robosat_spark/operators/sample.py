"""Deterministic sampling and dataset splitting as pure column expressions.

A training-data pipeline needs samples and train/val/test splits that are
REPRODUCIBLE: the same row must land in the same subset on every rerun,
at every cluster size, under every repartitioning. Spark's ``df.sample``
/ ``rand()`` give none of that (seeded per-partition, so any change to
partitioning reshuffles membership). The operators here derive membership
from an engine-replayable hash of a STABLE KEY column — the repo's 60-bit
md5 hash (operators.dedup._hash60) — compared against integer thresholds
computed once in Python:

    keep  <=>  hash60(key || '|' || salt) < floor(fraction * 2^60)

Properties that matter at 100 TB:
- pure map-side filter/projection: no shuffle, no sort, no sample
  collection pass; scales embarrassingly and composes with pushdown;
- decorrelated uses: the salt namespaces each decision, so a 10% QA
  sample and an 80/10/10 split over the same table are independent;
- exactly replayable in SQL (DuckDB twin: ('0x' || substr(md5(k), 1,
  15))::BIGINT), so sampled membership is an exact oracle gate despite
  being "random";
- sampling is by EXPECTATION (binomial around fraction*n), the standard
  contract of hash/Bernoulli sampling — deterministic given the key set.

Reference behavior analog: robosat holds out validation tiles by
directory convention (/root/reference/robosat/tools/cover.py writes the
tile lists users split by hand); here the split is a first-class,
key-stable operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60

_SCALE = 1 << 60


def sample_hash(key: Column, salt: str = "") -> Column:
    """Uniform 60-bit hash of the row's sampling key (key rendered as a
    string; NULL key -> NULL hash, which fails every threshold — NULL
    keys are never sampled)."""
    return _hash60(F.concat(key.cast("string"), F.lit("|" + salt)))


def threshold(fraction: float) -> int:
    """Integer threshold for a keep-fraction; the same literal lands in
    the Spark plan and the SQL twin."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return int(fraction * _SCALE)


def hash_sample(df: DataFrame, key: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key-hash falls
    under ``fraction`` of the hash space."""
    return df.filter(sample_hash(F.col(key), salt) < F.lit(threshold(fraction)))


def stratified_sample(df: DataFrame, key: str, strata: str,
                      fractions: dict[str, float], default: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum keep-fractions (e.g. keep 50% of 'en' docs, 10% of the
    rest): the hash is compared to the stratum's own threshold. The
    fractions dict is a literal CASE chain — no join, no shuffle."""
    h = sample_hash(F.col(key), salt)
    thr = F.lit(threshold(default))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata) == value, F.lit(threshold(frac))).otherwise(thr)
    return df.filter(h < thr)


def split_assign(df: DataFrame, key: str,
                 weights: tuple[float, ...] = (0.8, 0.1, 0.1),
                 labels: tuple[str, ...] = ("train", "val", "test"),
                 salt: str = "", out: str = "split") -> DataFrame:
    """Adds column ``out`` assigning every row to exactly one split by
    consecutive hash ranges (train = [0, w0), val = [w0, w0+w1), ...).
    Weights must sum to 1 (the last range is closed at the top so no row
    is unassigned)."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have the same length")
    if abs(sum(weights) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {sum(weights)}")
    h = sample_hash(F.col(key), salt)
    cuts = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        cuts.append(threshold(acc))
    expr = F.lit(labels[-1])
    for cut, label in zip(reversed(cuts), reversed(labels[:-1])):
        expr = F.when(h < F.lit(cut), F.lit(label)).otherwise(expr)
    return df.withColumn(out, expr)


# -- DuckDB SQL twins ---------------------------------------------------------


def sample_hash_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`sample_hash` (same md5-prefix hash the
    dedup/sketch twins replay)."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '|{salt}'), "
        f"1, 15))::BIGINT)"
    )


def hash_sample_sql(key_expr: str, fraction: float, salt: str = "") -> str:
    """WHERE-clause twin of :func:`hash_sample`."""
    return f"{sample_hash_sql(key_expr, salt)} < {threshold(fraction)}"


def stratified_sample_sql(key_expr: str, strata_expr: str,
                          fractions: dict[str, float], default: float = 0.0,
                          salt: str = "") -> str:
    """WHERE-clause twin of :func:`stratified_sample` (same sorted-CASE
    structure, same thresholds)."""
    thr = str(threshold(default))
    for value, frac in sorted(fractions.items()):
        thr = (
            f"CASE WHEN {strata_expr} = '{value}' "
            f"THEN {threshold(frac)} ELSE {thr} END"
        )
    return f"{sample_hash_sql(key_expr, salt)} < ({thr})"


def split_assign_sql(key_expr: str,
                     weights: tuple[float, ...] = (0.8, 0.1, 0.1),
                     labels: tuple[str, ...] = ("train", "val", "test"),
                     salt: str = "") -> str:
    """CASE-expression twin of :func:`split_assign`."""
    h = sample_hash_sql(key_expr, salt)
    parts = []
    acc = 0.0
    for w, label in zip(weights[:-1], labels[:-1]):
        acc += w
        parts.append(f"WHEN {h} < {threshold(acc)} THEN '{label}'")
    return "CASE " + " ".join(parts) + f" ELSE '{labels[-1]}' END"
