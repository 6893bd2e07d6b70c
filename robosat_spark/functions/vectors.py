"""Embedding-vector expressions: dot/cosine JVM-side via higher-order fns.

For the similarity-search operators (ANN brute-force baseline + LSH bucket
scale path). ``F.zip_with`` + ``F.aggregate`` keep the arithmetic inside
Tungsten — no Python for the distance math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_dist(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def lsh_bucket(a: Column, plane_seeds: list, scale: float = 1000.0) -> Column:
    """Random-hyperplane LSH bucket id (sign pattern over K deterministic
    pseudo-planes). Plane k weight for dim i = fractional hash of (seed, i),
    computed JVM-side via a deterministic transform of the element index.

    Cheap bucketing for the near-dup scale path: candidate pairs share a
    bucket; exact cosine refines inside the bucket."""
    bucket = F.lit(0).cast("long")
    for k, seed in enumerate(plane_seeds):
        # pseudo-random plane: w_i = sin(seed * (i+1)) — deterministic,
        # identical in any SQL engine with sin()
        proj = F.aggregate(
            F.zip_with(
                a,
                F.transform(F.sequence(F.lit(1), F.size(a)), lambda i: F.sin(F.lit(float(seed)) * i.cast("double"))),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"), k))
    return bucket
