"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship pages->geotag->tile-encode->PIP->agg pipeline
                    on /root/testdata/sf0.001 (SURVEY.md §7 step 2).
``queries()``     — one entry per implemented operator (SURVEY.md §2).
``oracle_sql()``  — DuckDB-equivalent SQL per query. SQL mirrors the exact
                    IEEE expression structure of the Spark plans (same
                    literals, same op order) so value-hashes match.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PI = "3.141592653589793"
LAT_LIMIT = "85.051128779806604"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Pages -> geotag extraction -> z12 tile encode -> PIP assign ->
    pages-per-(tile, feature) counts, on the sf0.001 events-derived pages."""
    from robosat_spark.operators.spatial_join import assign_broadcast, assign_counts_per_tile
    from robosat_spark.sources.oracle_features import oracle_rect_features
    from robosat_spark.sources.pages import pages_from_events

    pg = pages_from_events(spark, "/root/testdata/sf0.001")
    ft = oracle_rect_features(spark)
    assigned = assign_broadcast(spark, pg, ft, zoom=12)
    return assign_counts_per_tile(assigned)


# ---------------------------------------------------------------------------
# Spark queries
# ---------------------------------------------------------------------------


def _q_pricing_summary(spark, sf_dir):
    """A1/A2-class aggregation: partial+final hash agg over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus",
            F.round("sum_qty", 4).alias("sum_qty"),
            F.round("sum_base_price", 4).alias("sum_base_price"),
            F.round("sum_disc_price", 4).alias("sum_disc_price"),
            "avg_qty", "count_order",
        )
    )


def _q_market_join(spark, sf_dir):
    """J1/J7-class multi-way equi join + agg + top-k (broadcast dims)."""
    cu = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cu), orders["o_custkey"] == cu["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def _q_semi_join(spark, sf_dir):
    """J1 left-semi: orders whose customer is in BUILDING segment."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(cu, orders["o_custkey"] == cu["c_custkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _q_anti_join(spark, sf_dir):
    """J4-class anti join: customers with no orders."""
    cu = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cu.join(orders, cu["c_custkey"] == orders["o_custkey"], "left_anti")
        .select("c_custkey", "c_mktsegment")
    )


def _q_latest_event_per_user(spark, sf_dir):
    """Latest-snapshot window (§2.9): row_number over ts desc per user —
    the as-of/idempotent-resume analog of download.py:48-49."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def _q_sessionize(spark, sf_dir):
    """Tumbling 1-hour window counts (streaming-shaped agg, §2.10)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "sum_value")
    )


def _q_tile_encode(spark, sf_dir):
    """G27+G1 chain: regex geotag extraction -> z12 slippy encode -> count
    per tile. The whole chain is JVM-side codegen."""
    from robosat_spark.operators.spatial_join import geotagged_points
    from robosat_spark.sources.pages import pages_from_events

    pts = geotagged_points(pages_from_events(spark, sf_dir), zoom=12)
    return (
        pts.groupBy(
            F.col("tile_id"),
        )
        .agg(F.count("*").alias("n_pages"))
    )


def _q_tile_adjacency(spark, sf_dir):
    """J6 tile-adjacency self-join: count occupied neighbor pairs among
    the distinct z12 tiles of the geotagged points."""
    from robosat_spark.functions.tiles import unpack_tile_x, unpack_tile_y
    from robosat_spark.operators.spatial_join import geotagged_points
    from robosat_spark.sources.pages import pages_from_events

    from robosat_spark.functions.tiles import neighbor_offsets_df

    pts = geotagged_points(pages_from_events(spark, sf_dir), zoom=12)
    tiles = pts.select(
        unpack_tile_x(F.col("tile_id")).alias("x"), unpack_tile_y(F.col("tile_id")).alias("y")
    ).distinct()
    # equi-join on shifted keys (J6 pattern): tiles x 8 offsets, then hash
    # join on the neighbor coordinate — O(T*8) not the O(T^2) theta join a
    # naive |dx|<=1 predicate would give
    probes = tiles.crossJoin(neighbor_offsets_df(spark)).select(
        (F.col("x") + F.col("dx")).alias("nx"), (F.col("y") + F.col("dy")).alias("ny")
    )
    pairs = probes.join(tiles, (F.col("nx") == F.col("x")) & (F.col("ny") == F.col("y")))
    return pairs.agg(F.count("*").alias("n_adjacent_pairs"))


def _q_pip_assign(spark, sf_dir):
    """The flagship spatial join (J2): REAL cover+PIP operator vs bbox SQL."""
    from robosat_spark.operators.spatial_join import assign_broadcast
    from robosat_spark.sources.oracle_features import oracle_rect_features
    from robosat_spark.sources.pages import pages_from_events

    pg = pages_from_events(spark, sf_dir)
    ft = oracle_rect_features(spark)
    assigned = assign_broadcast(spark, pg, ft, zoom=7)
    return assigned.groupBy("feature_id").agg(
        F.count("*").alias("n_pages"), F.countDistinct("url").alias("n_urls")
    )


def _q_knn(spark, sf_dir):
    """J8/O5 kNN: 3 nearest rect-features per sampled point, rank-windowed."""
    from robosat_spark.operators.knn import knn_bruteforce
    from robosat_spark.operators.spatial_join import geotagged_points
    from robosat_spark.sources.oracle_features import oracle_rect_features
    from robosat_spark.sources.pages import pages_from_events

    pts = geotagged_points(pages_from_events(spark, sf_dir), zoom=12)
    # deterministic sample (url digits mod 37) keeps the cross join oracle-sized
    sample = pts.filter(
        (F.substring("url", 23, 8).cast("long") % 37) == 0
    ).select("url", "lon", "lat")
    ft = oracle_rect_features(spark)
    out = knn_bruteforce(sample, ft, k=3)
    return out.select("url", "feature_id", "rank", F.round("dist_deg", 9).alias("dist_deg"))


def _q_dedup_exact(spark, sf_dir):
    """Exact text dedup: hash-groupBy on normalized text, keep min doc_id."""
    from robosat_spark.functions.text import normalized_text

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.withColumn("key", F.md5(normalized_text(F.col("text"))))
        .groupBy("key")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_dupes"))
    )


def _q_fingerprint(spark, sf_dir):
    """K-robust content fingerprint: md5 prefix (exact-dup key per doc)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.substring(F.md5("text"), 1, 16).alias("fp"))


def _q_token_stats(spark, sf_dir):
    """Token counting + quality scoring over documents."""
    from robosat_spark.functions.text import (
        alpha_ratio,
        punct_ratio,
        subword_count,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_count(F.col("text")).alias("n_subwords"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(alpha_ratio(F.col("text")), 6).alias("alpha_ratio"),
    )


def _q_lang_id(spark, sf_dir):
    """Marker-lexicon language ID over documents."""
    from robosat_spark.functions.text import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("pred_lang"))


def _q_ann_cosine(spark, sf_dir):
    """Brute-force cosine top-5 per query vector (vec_id < 3), the ANN
    baseline; JVM-side zip_with/aggregate arithmetic."""
    from robosat_spark.functions.vectors import cosine_sim

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("item_id"), F.col("embedding").cast("array<double>").alias("item_vec")
    )
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").cast("array<double>").alias("query_vec")
    )
    cand = base.crossJoin(F.broadcast(queries_df)).filter(F.col("item_id") != F.col("query_id"))
    cand = cand.withColumn("sim", cosine_sim(F.col("item_vec"), F.col("query_vec")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("item_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "item_id", "rank", F.round("sim", 6).alias("sim"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": _q_pricing_summary,
        "market_join": _q_market_join,
        "semi_join": _q_semi_join,
        "anti_join": _q_anti_join,
        "latest_event_per_user": _q_latest_event_per_user,
        "sessionize": _q_sessionize,
        "tile_encode": _q_tile_encode,
        "tile_adjacency": _q_tile_adjacency,
        "pip_assign": _q_pip_assign,
        "knn": _q_knn,
        "dedup_exact": _q_dedup_exact,
        "fingerprint": _q_fingerprint,
        "token_stats": _q_token_stats,
        "lang_id": _q_lang_id,
        "ann_cosine": _q_ann_cosine,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# events-derived pages (mirrors robosat_spark.sources.pages.ORACLE_PAGES_SQL)
_PAGES = """
  SELECT printf('https://example.org/e/%08d', event_id) AS url,
         ts AS warc_ts,
         CASE WHEN event_id % 10 < 8
              THEN CAST(printf('%.7f', ((event_id * 104729) % 160000) / 1000.0 - 80.0) AS DOUBLE)
              ELSE NULL END AS lat,
         CASE WHEN event_id % 10 < 8
              THEN CAST(printf('%.7f', ((event_id * 7919) % 360000) / 1000.0 - 180.0) AS DOUBLE)
              ELSE NULL END AS lon
  FROM events
"""


def _tile_sql(zoom: int):
    """SQL twins of functions.tiles.tile_x/tile_y/pack_tile_id — identical
    literal structure for bit-identical floors."""
    n = float(2**zoom)
    nmax = int(n) - 1
    tx = f"CAST(LEAST(GREATEST(FLOOR((lon + 180.0) / 360.0 * {n!r}), 0), {nmax}) AS BIGINT)"
    clip = f"LEAST(GREATEST(lat, -{LAT_LIMIT}), {LAT_LIMIT})"
    t = f"TAN(RADIANS({clip}))"
    asinh_t = f"LN({t} + SQRT({t} * {t} + 1.0))"
    ty = (
        f"CAST(LEAST(GREATEST(FLOOR((1.0 - {asinh_t} / {PI}) / 2.0 * {n!r}), 0), {nmax}) AS BIGINT)"
    )
    pack = f"((CAST({zoom} AS BIGINT) << 58) | (tx << 29) | ty)"
    return tx, ty, pack


def oracle_sql() -> dict[str, str]:
    from robosat_spark.functions.text import LANG_MARKERS, STOPWORDS_EN  # noqa: F401
    from robosat_spark.sources.oracle_features import ORACLE_RECTS, rect_centroids_vertexmean

    tx12, ty12, pack12 = _tile_sql(12)

    sql = {}

    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               ROUND(AVG(l_quantity), 6) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    sql["market_join"] = """
        SELECT c_mktsegment,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               COUNT(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """

    sql["semi_join"] = """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority
    """

    sql["anti_join"] = """
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """

    sql["latest_event_per_user"] = """
        SELECT user_id, event_id, ts, event_type
        FROM (SELECT user_id, event_id, ts, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1
    """

    sql["sessionize"] = """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
               COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """

    sql["tile_encode"] = f"""
        SELECT {pack12} AS tile_id, COUNT(*) AS n_pages
        FROM (SELECT {tx12} AS tx, {ty12} AS ty
              FROM ({_PAGES}) WHERE lon IS NOT NULL AND lat IS NOT NULL)
        GROUP BY 1
    """

    sql["tile_adjacency"] = f"""
        WITH tiles AS (
          SELECT DISTINCT {tx12} AS x, {ty12} AS y
          FROM ({_PAGES}) WHERE lon IS NOT NULL AND lat IS NOT NULL
        )
        SELECT COUNT(*) AS n_adjacent_pairs
        FROM tiles a JOIN tiles b
          ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
         AND (a.x != b.x OR a.y != b.y)
    """

    rect_cases = " ".join(
        f"WHEN lon >= {x0!r} AND lon <= {x1!r} AND lat >= {y0!r} AND lat <= {y1!r} THEN {fid}"
        for fid, x0, y0, x1, y1 in ORACLE_RECTS
    )
    sql["pip_assign"] = f"""
        SELECT feature_id, COUNT(*) AS n_pages, COUNT(DISTINCT url) AS n_urls
        FROM (SELECT url, CASE {rect_cases} ELSE NULL END AS feature_id
              FROM ({_PAGES}) WHERE lon IS NOT NULL AND lat IS NOT NULL)
        WHERE feature_id IS NOT NULL
        GROUP BY feature_id
    """

    cent_rows = ", ".join(f"({fid}, {cx!r}, {cy!r})" for fid, cx, cy in rect_centroids_vertexmean())
    sql["knn"] = f"""
        WITH pts AS (
          SELECT url, lon, lat FROM ({_PAGES})
          WHERE lon IS NOT NULL AND lat IS NOT NULL
            AND CAST(substr(url, 23, 8) AS BIGINT) % 37 = 0
        ),
        cents(feature_id, c_lon, c_lat) AS (VALUES {cent_rows}),
        cand AS (
          SELECT url, feature_id,
                 POWER((lon - c_lon) * COS(RADIANS(lat)), 2) + POWER(lat - c_lat, 2) AS d2
          FROM pts CROSS JOIN cents
        )
        SELECT url, feature_id, rank, ROUND(SQRT(d2), 9) AS dist_deg
        FROM (SELECT url, feature_id, d2,
                     ROW_NUMBER() OVER (PARTITION BY url ORDER BY d2 ASC, feature_id ASC) AS rank
              FROM cand)
        WHERE rank <= 3
    """

    sql["dedup_exact"] = """
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS key,
               MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_dupes
        FROM documents
        GROUP BY 1
    """

    sql["fingerprint"] = """
        SELECT doc_id, substr(md5(text), 1, 16) AS fp FROM documents
    """

    sql["token_stats"] = r"""
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_subwords,
               ROUND(CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END, 6) AS punct_ratio,
               ROUND(CASE WHEN length(text) > 0
                     THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text)
                     ELSE 0.0 END, 6) AS alpha_ratio
        FROM documents
    """

    # lang_id: mirror the argmax-with-first-wins tie-break
    def marker_count(lg):
        alts = "|".join(LANG_MARKERS[lg])
        return rf"len(regexp_extract_all(lower(text), '\b({alts})\b'))"

    langs = list(LANG_MARKERS)
    score_cols = ", ".join(f"{marker_count(lg)} AS s_{lg}" for lg in langs)
    best = f"GREATEST({', '.join('s_' + lg for lg in langs)})"
    pick = "CASE "
    for lg in langs:
        pick += f"WHEN s_{lg} = {best} THEN '{lg}' "
    pick += "END"
    sql["lang_id"] = f"""
        SELECT doc_id, CASE WHEN {best} > 0 THEN {pick} ELSE 'und' END AS pred_lang
        FROM (SELECT doc_id, text, {score_cols} FROM documents)
    """

    sql["ann_cosine"] = """
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT query_id, item_id, rank, ROUND(sim, 6) AS sim
        FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS item_id,
                 list_cosine_similarity(e.v, q.v) AS sim,
                 ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                    ORDER BY list_cosine_similarity(e.v, q.v) DESC, e.vec_id ASC) AS rank
          FROM base e CROSS JOIN (SELECT * FROM base WHERE vec_id < 3) q
          WHERE e.vec_id != q.vec_id
        )
        WHERE rank <= 5
    """

    return sql
