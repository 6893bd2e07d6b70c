"""Synthetic Common-Crawl-style ``pages`` table, deterministic + distributed.

Schema per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Every column is a pure Column expression over ``spark.range(n)`` — no
Python, no RNG state — so the same (url, text) pair is produced on any
cluster size and any partitioning (the per-row invariant "byte-identical
extracted text per url"). At production scale this module is replaced by
``spark.read.table("pages")`` on Iceberg; the pipeline code is identical.

Geometry of the synthetic world (FIXTURES.md §1): ~80% of pages carry a
``geo:{lat:.7f},{lon:.7f}`` token. Geotagged points are drawn inside the
parking-fixture bbox (lon -82.84..-82.80, lat 34.66..34.69); 10% are
world-scattered noise; and one hot z18 tile deliberately receives ~half of
the bbox points (the skew fixture the salted repartition must handle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "parking", "building", "road", "water",
]
LANGS = ["en", "de", "fr", "es", "pt"]

# parking-fixture bbox (FIXTURES.md §1)
LON0, LON1 = -82.84, -82.80
LAT0, LAT1 = 34.66, 34.69
# the hot tile: a narrow window inside the bbox, ~one z18 tile wide
HOT_LON0, HOT_LON1 = -82.8230, -82.8221
HOT_LAT0, HOT_LAT1 = 34.6780, 34.6788


def pages(spark: SparkSession, n: int = 100_000, partitions: int | None = None) -> DataFrame:
    """Build the deterministic pages table with ``n`` base urls.

    ~5% of urls get a second, later snapshot row with byte-identical text
    (exercises the latest-snapshot window / as-of dedup)."""
    base = spark.range(0, n, 1, partitions) if partitions else spark.range(n)
    i = F.col("id")

    def frac(mult: int, mod: int = 1_000_003):
        """Deterministic pseudo-uniform in [0,1): ((id*mult) mod p) / p."""
        return ((i * F.lit(mult)) % F.lit(mod)).cast("double") / F.lit(float(mod))

    # word-salad body: 12 words chosen by modular hashes of id
    words = [
        F.element_at(
            F.array(*[F.lit(w) for w in WORDS]),
            ((i * F.lit(97 + 13 * k) + F.lit(31 * k)) % F.lit(len(WORDS))).cast("int") + 1,
        )
        for k in range(12)
    ]
    body = F.concat_ws(" ", *words)

    has_geo = frac(7919) < 0.8
    is_noise = frac(104729) < 0.10  # of the geotagged: world-scattered
    is_hot = frac(15485863) < 0.5  # of the bbox points: the hot tile

    lon_bbox = F.when(
        is_hot, F.lit(HOT_LON0) + frac(217645177) * F.lit(HOT_LON1 - HOT_LON0)
    ).otherwise(F.lit(LON0) + frac(32452843) * F.lit(LON1 - LON0))
    lat_bbox = F.when(
        is_hot, F.lit(HOT_LAT0) + frac(midrange := 179424673) * F.lit(HOT_LAT1 - HOT_LAT0)
    ).otherwise(F.lit(LAT0) + frac(49979687) * F.lit(LAT1 - LAT0))
    lon = F.when(is_noise, frac(67867967) * F.lit(360.0) - F.lit(180.0)).otherwise(lon_bbox)
    lat = F.when(is_noise, frac(86028121) * F.lit(160.0) - F.lit(80.0)).otherwise(lat_bbox)

    geo_token = F.format_string("geo:%.7f,%.7f", lat, lon)
    text = F.when(has_geo, F.concat_ws(" ", body, geo_token)).otherwise(body)

    url = F.format_string("https://example.org/p/%08d", i)
    warc_ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), ((i * F.lit(9973)) % F.lit(31_536_000)).cast("double")
    )
    df = base.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(F.format_string("<html><body>%s</body></html>", text), "UTF-8").alias("html"),
        text.alias("text"),
        F.element_at(
            F.array(*[F.lit(lg) for lg in LANGS]), ((i * F.lit(31)) % F.lit(5)).cast("int") + 1
        ).alias("lang"),
    )

    # second snapshot for ~5% of urls: +1 day, identical url/html/text/lang
    resnap = df.filter((F.crc32(F.col("url")) % 20) == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    return df.unionByName(resnap)


# Derivation constants for the oracle-checkable pages view over the shared
# ``events`` testdata table. lon/lat are pure integer arithmetic on event_id
# (3-decimal lattice), so the DuckDB oracle reproduces them exactly; the geo
# token round-trips through %.7f formatting on both sides, making the parsed
# doubles bit-identical.
EV_LON_MULT, EV_LAT_MULT = 7919, 104729
EV_GEO_FRAC = 10  # event_id % 10 < 8 -> geotagged (80%)


def pages_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pages-shaped view over ``{sf_dir}/events.parquet``.

    Used by the driver-checked queries: the Spark side runs the real
    geotag-extraction + tile-encode + PIP operators on this table while the
    DuckDB oracle recomputes lon/lat arithmetically — an end-to-end
    correctness gate for the extraction chain (G27)."""
    from .scan import fan_out_unsplittable_scan

    path = f"{sf_dir}/events.parquet"
    # The %.7f text build below runs INSIDE the scan projection at
    # ~11 us/row, so a single-row-group events file makes the whole
    # pages family single-threaded regardless of cores; fan the RAW
    # event columns (an exchange ABOVE the projection cannot help — the
    # formatting would already have happened in the lone scan task).
    # Size-floored + row-group-aware: a no-op at the small bench tables
    # (fresh-JVM A/B: fanning 2 MB loses ~0.1 s) and at any input whose
    # footer already yields natural scan parallelism.
    ev = fan_out_unsplittable_scan(
        spark, spark.read.parquet(path), path
    )
    i = F.col("event_id")
    lon = ((i * EV_LON_MULT) % 360000).cast("double") / F.lit(1000.0) - F.lit(180.0)
    lat = ((i * EV_LAT_MULT) % 160000).cast("double") / F.lit(1000.0) - F.lit(80.0)
    has_geo = (i % EV_GEO_FRAC) < (EV_GEO_FRAC - 2)
    text = F.when(
        has_geo, F.format_string("event %s %.7f geo:%.7f,%.7f", F.col("event_type"), F.col("value"), lat, lon)
    ).otherwise(F.format_string("event %s %.7f", F.col("event_type"), F.col("value")))
    return ev.select(
        F.format_string("https://example.org/e/%08d", i).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.encode(text, "UTF-8").alias("html"),
        text.alias("text"),
        F.lit("en").alias("lang"),
    )


def pages_table(spark: SparkSession, name: str) -> DataFrame:
    """Production input path: a catalog table (Iceberg at deployment — the
    connector jar is environment-provided; in this sandbox any registered
    table/view with the pages schema). Without a catalog, the in-repo
    from-scratch connector reads spec-conformant Iceberg v2 tables
    directly: ``sources.iceberg.IcebergTable(path).scan(spark, ...)`` with
    snapshot isolation, time travel, and partition/bounds pruning.
    Downstream operators are identical: they see a DataFrame with
    (url, warc_ts, html, text, lang)."""
    return spark.read.table(name)


ORACLE_PAGES_SQL = f"""
SELECT
  printf('https://example.org/e/%08d', event_id) AS url,
  ts AS warc_ts,
  CASE WHEN event_id % {EV_GEO_FRAC} < {EV_GEO_FRAC - 2}
       THEN CAST(printf('%.7f', ((event_id * {EV_LAT_MULT}) % 160000) / 1000.0 - 80.0) AS DOUBLE)
       ELSE NULL END AS lat,
  CASE WHEN event_id % {EV_GEO_FRAC} < {EV_GEO_FRAC - 2}
       THEN CAST(printf('%.7f', ((event_id * {EV_LON_MULT}) % 360000) / 1000.0 - 180.0) AS DOUBLE)
       ELSE NULL END AS lon
FROM events
"""
