"""Distinct-count sketching (HyperLogLog) as pure column expressions.

At 10^12 rows an exact COUNT(DISTINCT url) shuffles every distinct key to
count it; the HLL sketch reduces the job to a 2^p-bucket groupBy whose
partial states merge associatively (MAX per bucket) — map-side combine
collapses each scan partition to at most 2^p rows before the shuffle, and
two sketches of different table slices union by bucket-wise MAX (the
standard re-aggregatable distinct-count operator; Flajolet, Fusy,
Gandouet, Meunier 2007, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm").

Deterministic by construction: the hash is the repo's engine-replayable
60-bit md5 hash (operators.dedup._hash60), the rank (rho) comes from the
base-2 digit count of the residual bits, and the estimator arithmetic is
plain double expressions — so a DuckDB twin reproduces the identical
bucket maxima AND the identical estimate: an EXACT value gate over an
approximate operator. No JVM sketch classes, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _hash60


def _alpha(m: int) -> float:
    """Bias-correction constant of the raw HLL estimator (FFGM07 §4)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_register_exprs(col: str, p: int = 6) -> tuple[Column, Column]:
    """(bucket, rho) column expressions of the HLL register update.

    bucket = top ``p`` bits of the 60-bit hash; rho = 1-based position of
    the highest set bit counted from the top of the remaining ``60 - p``
    bits (all-zero residual -> 60 - p + 1). The msb position is derived
    from the base-2 digit count (Spark ``conv(x, 10, 2)`` / DuckDB
    ``bin(x)`` — same digit strings), keeping both engines bit-identical.
    Shared by the batch register build and the streaming register state
    (streaming.ingest.streaming_hll_registers)."""
    w = 60 - p
    h = _hash60(F.col(col))
    rest = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rest == 0, F.lit(w + 1)).otherwise(
        F.lit(w) - F.length(F.conv(rest, 10, 2)) + 1
    )
    return F.shiftright(h, w).alias("bucket"), rho.cast("int").alias("rho")


def hll_buckets(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """-> (bucket, max_rho): the HLL register table. Only non-empty
    buckets are materialized (<= 2^p rows total)."""
    bucket, rho = hll_register_exprs(col, p)
    return df.select(bucket, rho).groupBy("bucket").agg(F.max("rho").alias("max_rho"))


def hll_estimate(p: int = 6) -> Column:
    """Aggregate COLUMN over a register table (any df with max_rho; apply
    via ``regs.agg(hll_estimate(p=p))``) -> the HLL cardinality estimate
    (raw estimator + FFGM07 small-range linear counting when E <= 2.5m
    and empty registers exist), rounded to 4 decimals so an engine ulp in
    the 2^-rho sum can't flip the value hash."""
    m = 1 << p
    z_nonempty = F.sum(F.pow(F.lit(2.0), -F.col("max_rho")))
    v = F.lit(float(m)) - F.count("*")  # empty registers (contribute 2^0)
    z = z_nonempty + v
    raw = F.lit(_alpha(m) * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return F.round(est, 4).alias("estimate")


def hll_distinct(df: DataFrame, col: str, p: int = 6) -> DataFrame:
    """-> (bucket, max_rho, estimate): the register table with the
    estimate attached as a constant column (one broadcast of a 1-row
    aggregate — keeps the full sketch state AND its readout in one
    result for gating/inspection)."""
    b = hll_buckets(df, col, p)
    est = b.agg(hll_estimate(p=p))
    return b.crossJoin(F.broadcast(est))


def cms_cell(col: Column, row: int, w: int) -> Column:
    """Column index of ``col``'s counter in CMS row ``row`` (width ``w``):
    the row-salted 60-bit md5 hash mod w. Nonnegative hash, so ``pmod``
    equals SQL ``%`` and DuckDB replays it verbatim."""
    return F.pmod(_hash60(F.concat(F.lit(f"{row}|"), col)), F.lit(w))


def _cms_cells(col: str, d: int, w: int) -> Column:
    """array<struct<row,col>> of all d counter cells for one value — the
    single definition both the counter build and the estimator explode
    (shared so the hashes can never drift apart)."""
    return F.array(
        *[
            F.struct(F.lit(i).alias("row"), cms_cell(F.col(col), i, w).alias("col"))
            for i in range(d)
        ]
    )


def cms_buckets(df: DataFrame, col: str, d: int = 4, w: int = 256) -> DataFrame:
    """-> (row, col, cnt): the Count-Min Sketch counter table (Cormode &
    Muthukrishnan 2005, "An improved data stream summary: the count-min
    sketch and its applications") — the heavy-hitter / point-frequency
    companion to the HLL distinct sketch.

    Each input value increments one counter per row (d row-salted
    hashes); a point estimate is the MIN over its d counters, an
    overestimate by construction and within eps*N with d=ceil(ln 1/δ),
    w=ceil(e/eps). Scale shape mirrors :func:`hll_buckets`: the explode
    fans each scan row to d cells, map-side combine collapses every
    partition to <= d*w rows before the shuffle, and sketches of table
    slices merge by cell-wise SUM — the re-aggregatable token-frequency
    metric a 100 TB corpus lineage needs (exact top-k over 10^9 distinct
    tokens shuffles every token; the sketch ships d*w longs)."""
    return (
        df.select(F.explode(_cms_cells(col, d, w)).alias("rc"))
        .groupBy(F.col("rc.row").alias("row"), F.col("rc.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(buckets: DataFrame, probes: DataFrame, col: str,
                 d: int = 4, w: int = 256) -> DataFrame:
    """-> probes + (est): CMS point-frequency estimate per probe value —
    MIN over the d row counters (0 for a value the sketch never saw).
    ``buckets`` is small (<= d*w rows) and broadcast; the probe side
    never shuffles."""
    probed = probes.withColumn("rc", F.explode(_cms_cells(col, d, w))).select(
        *probes.columns, F.col("rc.row").alias("row"), F.col("rc.col").alias("col")
    )
    joined = probed.join(F.broadcast(buckets), ["row", "col"], "left")
    return (
        joined.groupBy(*probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def bloom_bits(df: DataFrame, col: str, k: int = 4, m: int = 2048) -> DataFrame:
    """-> (bit,): the SET bits of a Bloom filter over ``df[col]`` (Bloom
    1970) — the membership sketch that answers "has this URL been
    crawled?" without shuffling the 10^12-row seen-set. Reuses the CMS
    row-salted md5 cell hash (bit_i = cms_cell(value, i, m)), so the
    DuckDB twin replays every bit. Bits merge across table slices by set
    UNION (distinct), the stored artifact is <= m rows of longs, and
    there are no false negatives; false-positive rate ~ (1-e^(-kn/m))^k."""
    return (
        df.select(F.explode(_cms_cells(col, k, m)).alias("rc"))
        .select(F.col("rc.col").alias("bit"))
        .distinct()
    )


def bloom_might_contain(bits: DataFrame, probes: DataFrame, col: str,
                        k: int = 4, m: int = 2048) -> DataFrame:
    """-> probes + (hit): 1 iff ALL k bit positions of the probe value
    are set (the Bloom membership test — a 0 is a certain miss, a 1 a
    probable hit). ``bits`` is broadcast; probes never shuffle."""
    probed = probes.withColumn("rc", F.explode(_cms_cells(col, k, m))).select(
        *probes.columns, F.col("rc.col").alias("bit")
    )
    marked = probed.join(
        F.broadcast(bits.withColumn("__present", F.lit(1))), "bit", "left"
    )
    # hit iff EVERY joined row matched (count(*) == count(present)), not
    # count == k: duplicate probe values group to 2k rows and a
    # non-distinct bits side multiplies matches — an == k test would
    # return false negatives for genuinely inserted values in both cases
    return marked.groupBy(*probes.columns).agg(
        (F.count("__present") == F.count("*")).cast("long").alias("hit")
    )


def hist_buckets(df: DataFrame, col: str, by: str, nb: int = 64) -> DataFrame:
    """-> (by, bucket, cnt): per-group equi-width histogram of ``col``
    over ``nb`` bins spanning the group's exact [min, max] — the
    distribution profile of the sketch family (HLL = distinct, CMS =
    frequency, Bloom = membership, histogram = shape). Bins of table
    slices sharing the same bounds merge by cell-wise SUM, the stored
    artifact is <= nb rows per group, and every expression is identical
    arithmetic in DuckDB (floor of the same IEEE double ops — no
    width_bucket, whose edge semantics would be an engine dependency).
    Values at max land in the last bin (clamped); NULLs are excluded —
    greatest() skips its NULL argument in both engines, so without the
    filter a NULL value would silently land in bin 0 and drag every
    quantile readout toward min (percentile/quantile_cont ignore NULLs,
    and the histogram must match their population)."""
    df = df.filter(F.col(col).isNotNull())
    stats = df.groupBy(by).agg(
        F.min(col).alias("__mn"), F.max(col).alias("__mx")
    )
    j = df.join(F.broadcast(stats), by)
    wd = (F.col("__mx") - F.col("__mn")) / F.lit(float(nb))
    b = hist_bin(F.col(col), F.col("__mn"), wd, nb)
    return (
        j.select(F.col(by), b.alias("bucket"))
        .groupBy(by, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def hist_bin(value: Column, lo: Column, wd: Column, nb: int) -> Column:
    """The ONE definition of the clamped-floor bin index (shared by the
    batch histogram and the streaming register state so the merge-by-SUM
    contract can't drift): floor((v - lo)/wd) clamped to [0, nb-1];
    degenerate width (all values equal) puts everything in bin 0."""
    return (
        F.when(
            wd > 0,
            F.least(
                F.greatest(F.floor((value - lo) / wd), F.lit(0)),
                F.lit(nb - 1),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )


def hist_quantiles(df: DataFrame, col: str, by: str, qs: dict,
                   nb: int = 64, materialize: bool = True) -> DataFrame:
    """-> (by, <name> per ``qs``): approximate quantiles read off the
    equi-width histogram by cumulative walk + linear interpolation
    within the covering bin (target rank q*n; first bin whose running
    count reaches it). Error is bounded by one bin width — the standard
    profile readout when the exact percentile's full sort/shuffle at
    10^12 rows is the thing being avoided. ``qs``: {"p50": 0.5, ...};
    ``__n`` counts non-NULL values only (the percentile population).
    Deterministic double arithmetic; DuckDB replays it exactly.

    ``materialize=True`` (default) runs an EAGER localCheckpoint of the
    (tiny, <= nb rows/group) cumulative table at CALL time — a Spark job
    fires inside this query builder, and the checkpoint's executor-local
    storage blocks stay pinned until the executor GCs them (the caller
    cannot unpersist a DataFrame it never sees). Without it, every
    per-quantile branch below re-runs the full input scan + aggregation
    (len(qs) scans). Pass ``materialize=False`` for plan-only use —
    composing into a streaming query, explaining, or when the caller
    caches ``df`` itself and prefers recomputation over pinned blocks."""
    from pyspark.sql import Window

    stats = df.groupBy(by).agg(
        F.min(col).alias("__mn"), F.max(col).alias("__mx"), F.count(col).alias("__n")
    )
    h = hist_buckets(df, col, by, nb).join(F.broadcast(stats), by)
    cum = F.sum("cnt").over(Window.partitionBy(by).orderBy("bucket"))
    h = h.withColumn("cum", cum)
    if materialize:
        h = h.localCheckpoint()
    wd = (F.col("__mx") - F.col("__mn")) / F.lit(float(nb))
    out = stats.select(by)
    for name, q in qs.items():
        target = F.lit(q) * F.col("__n")
        est = F.when(
            wd > 0,
            F.col("__mn")
            + F.col("bucket") * wd
            + wd * (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
        ).otherwise(F.col("__mn"))
        rn = F.row_number().over(Window.partitionBy(by).orderBy("bucket"))
        pick = (
            h.filter(F.col("cum") >= target)
            .withColumn("__rn", rn)
            .filter(F.col("__rn") == 1)
            .select(F.col(by), est.alias(name))
        )
        out = out.join(pick, by)
    return out


def hist_quantiles_sql(table: str, col: str, by: str, qs: dict,
                       nb: int = 64) -> str:
    """DuckDB twin of :func:`hist_quantiles` (same bin arithmetic, same
    cumulative walk and interpolation)."""
    wd = f"((s.mx - s.mn) / {float(nb)!r})"
    picks = []
    sels = []
    for name, q in qs.items():
        picks.append(f"""
        pick_{name} AS (
          SELECT {by}, est AS {name} FROM (
            SELECT c.{by},
                   CASE WHEN (s.mx - s.mn) > 0
                        THEN s.mn + c.bucket * {wd}
                             + {wd} * ({q!r} * s.n - (c.cum - c.cnt)) / c.cnt
                        ELSE s.mn END AS est,
                   ROW_NUMBER() OVER (PARTITION BY c.{by} ORDER BY c.bucket) AS rn
            FROM cum c JOIN stats s USING ({by})
            WHERE c.cum >= {q!r} * s.n) WHERE rn = 1)""")
        sels.append(f"pick_{name}")
    joins = sels[0]
    for s in sels[1:]:
        joins += f" JOIN {s} USING ({by})"
    cols = ", ".join(qs)
    return f"""
        WITH stats AS (SELECT {by}, MIN({col}) AS mn, MAX({col}) AS mx,
                              COUNT({col}) AS n
                       FROM {table} GROUP BY 1),
        hist AS (
          SELECT e.{by},
                 CAST(CASE WHEN (s.mx - s.mn) > 0
                      THEN LEAST(GREATEST(FLOOR((e.{col} - s.mn)
                                / ((s.mx - s.mn) / {float(nb)!r})), 0), {nb - 1})
                      ELSE 0 END AS INT) AS bucket,
                 COUNT(*) AS cnt
          FROM {table} e JOIN stats s USING ({by})
          WHERE e.{col} IS NOT NULL
          GROUP BY 1, 2),
        cum AS (SELECT {by}, bucket, cnt,
                       SUM(cnt) OVER (PARTITION BY {by} ORDER BY bucket) AS cum
                FROM hist),
        {", ".join(picks)}
        SELECT {by}, {cols} FROM {joins}
    """


def cms_sql(values_cte: str, col: str, d: int = 4, w: int = 256) -> str:
    """DuckDB twin of :func:`cms_buckets` as a CTE body. ``values_cte``
    is a FROM-able fragment exposing column ``col``; yields a relation
    (row, col, cnt) with the identical row-salted md5 cell hash."""
    cell = (
        f"(('0x' || substr(md5(CAST(i.row AS VARCHAR) || '|' || {col}), 1, 15))::BIGINT"
        f" % {w})"
    )
    rows = ", ".join(str(i) for i in range(d))
    return f"""
        SELECT i.row AS row, {cell} AS col, COUNT(*) AS cnt
        FROM {values_cte} CROSS JOIN (SELECT unnest([{rows}]) AS row) i
        GROUP BY 1, 2
    """


def hll_sql(table_expr: str, col: str, p: int = 6) -> str:
    """DuckDB twin of :func:`hll_distinct` (identical hash, rho, and
    estimator expressions). ``table_expr`` is a FROM-able SQL fragment."""
    m = 1 << p
    w = 60 - p
    hash60 = f"('0x' || substr(md5({col}), 1, 15))::BIGINT"
    rest = f"({hash60} & {(1 << w) - 1})"
    rho = f"(CASE WHEN {rest} = 0 THEN {w + 1} ELSE {w} - length(bin({rest})) + 1 END)"
    return f"""
        WITH regs AS (
          SELECT ({hash60} >> {w}) AS bucket, CAST(MAX({rho}) AS INT) AS max_rho
          FROM {table_expr} GROUP BY 1
        ),
        est AS (
          SELECT ROUND(
            CASE WHEN ({_alpha(m) * m * m!r} / (SUM(POWER(2.0, -max_rho))
                        + ({float(m)!r} - COUNT(*)))) <= {2.5 * m!r}
                      AND ({float(m)!r} - COUNT(*)) > 0
                 THEN {float(m)!r} * LN({float(m)!r} / ({float(m)!r} - COUNT(*)))
                 ELSE {_alpha(m) * m * m!r} / (SUM(POWER(2.0, -max_rho))
                        + ({float(m)!r} - COUNT(*)))
            END, 4) AS estimate
          FROM regs
        )
        SELECT regs.bucket, regs.max_rho, est.estimate FROM regs CROSS JOIN est
    """


# -- persist-and-merge surface ------------------------------------------------
#
# The four sketches advertise re-aggregatability across table slices; at
# 100 TB that means: sketch each partition/day into its own stored register
# table, then merge the stored artifacts later WITHOUT rescanning the data.
# merge_sketch_slices is the one definition of the merge rules; the
# Iceberg roundtrip (write each slice's registers as a table, read back,
# merge) is gated in the hll_distinct driver query and exposed as the
# `sketch merge` CLI verb.

SKETCH_MERGE_RULES = {
    # kind -> (value column, merge aggregate); None = set-union distinct
    "hll": ("max_rho", "max"),
    "cms": ("cnt", "sum"),
    "hist": ("cnt", "sum"),
    "bloom": (None, "union"),
}


def merge_sketch_slices(slices: list[DataFrame], kind: str) -> DataFrame:
    """Merge per-slice sketch register tables into the register table of
    the union of the slices — exactly (not approximately): HLL registers
    merge by bucket-wise MAX, CMS counters and histogram bins by cell-wise
    SUM, Bloom set-bits by set UNION. Key columns are every column except
    the rule's value column, so the same rule covers grouped variants
    (e.g. hist with a ``by`` column or windowed streaming registers)."""
    if kind not in SKETCH_MERGE_RULES:
        raise ValueError(
            f"kind must be one of {sorted(SKETCH_MERGE_RULES)}, got {kind!r}"
        )
    if not slices:
        raise ValueError("no register tables to merge")
    u = slices[0]
    for s in slices[1:]:
        u = u.unionByName(s)
    val, how = SKETCH_MERGE_RULES[kind]
    if how == "union":
        return u.distinct()
    keys = [c for c in u.columns if c != val]
    agg = F.max(val) if how == "max" else F.sum(val)
    return u.groupBy(*keys).agg(agg.alias(val))
