"""Structured-Streaming ingest: batch/stream parity on the same files."""

import pyspark.sql.functions as F
import pytest

from robosat_spark.streaming.ingest import (
    run_available_now,
    streaming_latest_snapshot,
    streaming_pages,
    streaming_tile_counts,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from robosat_spark.sources.pages import pages

    d = str(tmp_path_factory.mktemp("stream") / "pages")
    pages(spark, 2000).write.parquet(d)
    return d


def test_streaming_tile_counts_match_batch(spark, pages_dir, tmp_path):
    stream = streaming_pages(spark, pages_dir)
    assert stream.isStreaming
    counts = streaming_tile_counts(stream, zoom=12, window="6 hours")
    q = run_available_now(counts, str(tmp_path / "ckpt"), "tile_counts", mode="complete")
    got = {
        (r["bucket"], r["tile_id"]): r["n_pages"]
        for r in spark.sql("select * from tile_counts").collect()
    }

    # batch twin on the same files with the same expressions
    from robosat_spark.operators.spatial_join import geotagged_points

    batch = geotagged_points(spark.read.parquet(pages_dir), 12)
    want = {
        (r["bucket"], r["tile_id"]): r["n_pages"]
        for r in batch.groupBy(
            F.window("warc_ts", "6 hours").alias("w"), "tile_id"
        )
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("bucket"), "tile_id", "n_pages")
        .collect()
    }
    assert got == want and len(got) > 0


def test_streaming_dedup_urls(spark, pages_dir, tmp_path):
    stream = streaming_pages(spark, pages_dir)
    deduped = streaming_latest_snapshot(stream).select("url")
    run_available_now(deduped, str(tmp_path / "ckpt2"), "dedup_urls", mode="append")
    n_stream = spark.sql("select count(distinct url) from dedup_urls").collect()[0][0]
    n_rows = spark.sql("select count(*) from dedup_urls").collect()[0][0]
    n_batch = spark.read.parquet(pages_dir).select("url").distinct().count()
    assert n_stream == n_batch
    assert n_rows == n_batch  # one row per url survived the streaming dedup
