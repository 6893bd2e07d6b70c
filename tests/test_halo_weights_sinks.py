"""Halo exchange (J6/G22/G23), class weights (A2/A3), sinks (K1/K3/K4)."""

import json
import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from robosat_spark.operators.halo import stitch_halo, unbuffer
from robosat_spark.operators.weights import class_histogram, class_weights


def _mask_df(spark, rows, size=8):
    data = [
        (18, x, y, size, size, np.full((size, size), v, dtype=np.uint8).tobytes())
        for x, y, v in rows
    ]
    return spark.createDataFrame(data, "z INT, x LONG, y LONG, w INT, h INT, data BINARY")


def test_stitch_halo_pastes_neighbors(spark):
    # center tile value 5, east neighbor 9, others missing (zero fill)
    masks = _mask_df(spark, [(10, 10, 5), (11, 10, 9)], size=8)
    out = {(r["x"], r["y"]): r for r in stitch_halo(spark, masks, overlap=2).collect()}
    c = out[(10, 10)]
    assert (c["w"], c["h"]) == (12, 12)
    grid = np.frombuffer(c["data"], dtype=np.uint8).reshape(12, 12)
    assert (grid[2:10, 2:10] == 5).all()  # center block
    assert (grid[2:10, 10:] == 9).all()  # east strip from neighbor
    assert (grid[:2, :] == 0).all()  # missing north row is nodata
    assert (grid[:, :2] == 0).all()  # missing west col is nodata


def test_stitch_then_unbuffer_roundtrip(spark):
    masks = _mask_df(spark, [(10, 10, 5), (11, 10, 9), (9, 10, 3)], size=8)
    halo = stitch_halo(spark, masks, overlap=2)
    back = {(r["x"], r["y"]): r for r in unbuffer(halo, overlap=2).collect()}
    grid = np.frombuffer(back[(10, 10)]["data"], dtype=np.uint8).reshape(8, 8)
    assert (grid == 5).all()


def test_class_histogram_and_weights(spark):
    size = 16
    a = np.zeros((size, size), dtype=np.uint8)
    a[:4, :] = 1  # 64 fg pixels of 256
    b = np.ones((size, size), dtype=np.uint8)  # 256 fg
    masks = spark.createDataFrame(
        [(18, 0, 0, size, size, a.tobytes()), (18, 1, 0, size, size, b.tobytes())],
        "z INT, x LONG, y LONG, w INT, h INT, data BINARY",
    )
    hist = {r["class"]: r["n"] for r in class_histogram(masks, 2).collect()}
    assert hist == {0: 192, 1: 320}
    w = {r["class"]: r for r in class_weights(class_histogram(masks, 2)).collect()}
    p1 = 320 / 512
    assert w[1]["p"] == pytest.approx(p1, abs=1e-9)
    assert w[1]["weight"] == pytest.approx(round(1.0 / math.log(1.02 + p1), 6), abs=1e-6)


def test_sinks_roundtrip(spark, tmp_path):
    from robosat_spark.sources.fixtures import features, tiles
    from robosat_spark.sources.sinks import (
        collect_feature_collection,
        save_feature_collection,
        write_slippy_grids,
        write_tiles_csv,
    )
    from robosat_spark.sources.fixtures import tiles_from_csv

    t = tiles(spark, "parking")
    write_tiles_csv(t, str(tmp_path / "tiles"))
    back = tiles_from_csv(spark, str(tmp_path / "tiles"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t.collect()))

    ft = features(spark).limit(3)
    fc = collect_feature_collection(ft)
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 3
    assert fc["features"][0]["geometry"]["type"] == "Polygon"
    save_feature_collection(ft, str(tmp_path / "out.geojson"))
    loaded = json.load(open(tmp_path / "out.geojson"))
    assert loaded == fc

    masks = _mask_df(spark, [(10, 10, 5), (11, 10, 9)], size=8)
    write_slippy_grids(masks, str(tmp_path / "grids"))
    rd = spark.read.parquet(str(tmp_path / "grids"))
    assert rd.count() == 2 and set(rd.columns) == {"z", "x", "y", "w", "h", "data"}
    # partition layout is the z/x/ directory convention
    assert (tmp_path / "grids" / "z=18").exists()


def test_throttled_idempotent_sink(spark, tmp_path):
    """S3 pattern: rate-limited external writes with skip-if-exists resume."""
    import time

    from robosat_spark.sources.sinks import throttled_idempotent_sink

    out = tmp_path / "ext"
    out.mkdir()
    df = spark.createDataFrame([(i,) for i in range(8)], "id LONG").repartition(1)

    def write_one(row):
        (out / f"{row['id']}.txt").write_text(str(row["id"]))

    def exists(key):
        return (out / f"{key[0]}.txt").exists()

    # pre-populate half: the rerun must skip them
    for i in range(4):
        (out / f"{i}.txt").write_text("pre")

    t0 = time.monotonic()
    throttled_idempotent_sink(df, write_one, ["id"], exists, rate_per_sec=20.0)
    dt = time.monotonic() - t0
    assert sorted(p.name for p in out.iterdir()) == [f"{i}.txt" for i in range(8)]
    assert all((out / f"{i}.txt").read_text() == "pre" for i in range(4))  # skipped
    assert dt >= 4 * (1 / 20.0) * 0.5  # throttle actually paced the 4 writes
