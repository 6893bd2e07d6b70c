"""Ensemble soft-vote (P2/J5/G21), segmentation metrics (A4), roads (F4/G7)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from robosat_spark.operators.ensemble import (
    confusion_counts,
    segmentation_metrics,
    soft_vote,
)
from robosat_spark.operators.rasterize import quantize_probs


def _prob_df(spark, fg: np.ndarray):
    h, w = fg.shape
    q = quantize_probs(fg)
    return spark.createDataFrame(
        [(18, 0, 0, w, h, q.tobytes())], "z INT, x LONG, y LONG, w INT, h INT, data BINARY"
    )


def _mask_df(spark, m: np.ndarray):
    h, w = m.shape
    return spark.createDataFrame(
        [(18, 0, 0, w, h, m.astype(np.uint8).tobytes())],
        "z INT, x LONG, y LONG, w INT, h INT, data BINARY",
    )


def test_soft_vote_weighted_argmax(spark):
    a = np.full((4, 4), 0.9)  # model A: confident fg
    b = np.full((4, 4), 0.2)  # model B: bg
    # equal weights: avg fg = 0.55 -> fg wins everywhere
    out = soft_vote([_prob_df(spark, a), _prob_df(spark, b)]).collect()[0]
    mask = np.frombuffer(out["data"], dtype=np.uint8).reshape(4, 4)
    assert (mask == 1).all()
    # B weighted 4x: avg fg = (0.9 + 4*0.2)/5 = 0.34 -> bg wins
    out = soft_vote([_prob_df(spark, a), _prob_df(spark, b)], [1.0, 4.0]).collect()[0]
    mask = np.frombuffer(out["data"], dtype=np.uint8).reshape(4, 4)
    assert (mask == 0).all()


def test_confusion_and_metrics(spark):
    pred = np.zeros((4, 4), dtype=np.uint8)
    pred[:2, :] = 1  # predicts top half fg (8 px)
    truth = np.zeros((4, 4), dtype=np.uint8)
    truth[:, :2] = 1  # truth: left half fg (8 px)
    counts = confusion_counts(_mask_df(spark, pred), _mask_df(spark, truth))
    row = counts.collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (4, 4, 4, 4)
    m = segmentation_metrics(counts).collect()[0]
    assert m["fg_iou"] == pytest.approx(4 / 12, abs=1e-6)
    assert m["miou"] == pytest.approx((4 / 12 + 4 / 12) / 2, abs=1e-6)
    assert m["mcc"] == pytest.approx(0.0, abs=1e-9)


def test_road_width_reference_semantics(spark):
    from robosat_spark.functions.roads import is_road, road_width_m

    rows = [
        # (highway, oneway, lanes_tag, width_tag, expected_m)
        ("motorway", None, None, None, 0.75 + 3.75 * 8 + 3.0),  # doubled lanes
        ("motorway", "yes", None, None, 0.75 + 3.75 * 4 + 3.0),  # oneway
        ("motorway", "no", None, None, 0.75 + 3.75 * 8 + 3.0),  # oneway=no doubles
        ("residential", "yes", "3", None, 0.0 + 3.5 * 3 + 0.75),  # lanes tag replaces
        ("residential", None, "0", None, 0.0 + 3.5 * 1 + 0.75),  # clamp lanes >= 1
        ("residential", None, "junk", None, 0.0 + 3.5 * 2 + 0.75),  # fallback on parse error
        ("service", None, None, "0.4", 1.0),  # width tag clamp >= 1.0
        ("service", None, None, "9.5", 9.5),  # width tag replaces
        ("service", None, None, "2 m", 3.0 * 2),  # unparseable width falls back
        ("footway", None, None, None, None),  # filtered out
    ]
    df = spark.createDataFrame(
        [(i, h, o, l, w) for i, (h, o, l, w, _) in enumerate(rows)],
        "id LONG, highway STRING, oneway STRING, lanes_tag STRING, width_tag STRING",
    )
    out = df.filter(is_road(F.col("highway"))).select(
        "id",
        road_width_m(F.col("highway"), F.col("oneway"), F.col("lanes_tag"), F.col("width_tag")).alias("w"),
    )
    got = {r["id"]: r["w"] for r in out.collect()}
    for i, (_, _, _, _, want) in enumerate(rows):
        if want is None:
            assert i not in got
        else:
            assert got[i] == pytest.approx(want, abs=1e-9), (i, got[i], want)


def test_compare_composites_hstack_and_keep_rule(spark, tmp_path):
    """Reference `rs compare` parity: per-tile horizontal concatenation
    of [label | mask] with the any-mask foreground-share keep filter
    (compare.py:44-68), written as slippy PNGs by the from-scratch codec
    and decoded back bit-exactly."""
    import numpy as np

    from robosat_spark.__main__ import main
    from robosat_spark.kernels.png import decode_png
    from robosat_spark.operators.ensemble import compare_composites

    w = h = 8
    lbl = np.zeros((h, w), np.uint8); lbl[2:5, 1:4] = 1
    m_fg = np.zeros((h, w), np.uint8); m_fg[0:4, 0:4] = 1     # share 0.25
    m_empty = np.zeros((h, w), np.uint8)                      # share 0.0
    rows_l = [(18, 10, 20, w, h, lbl.tobytes()), (18, 11, 20, w, h, lbl.tobytes())]
    rows_m = [(18, 10, 20, w, h, m_fg.tobytes()), (18, 11, 20, w, h, m_empty.tobytes())]
    schema = "z INT, x LONG, y LONG, w INT, h INT, data BINARY"
    labels = spark.createDataFrame(rows_l, schema)
    masks = spark.createDataFrame(rows_m, schema)

    # minimum 0.1 drops the empty-mask tile; survivor = hstack(label, mask)
    out = compare_composites(labels, [masks], minimum=0.1).collect()
    assert [(r["x"], r["w"], r["h"]) for r in out] == [(10, 16, 8)]
    got = np.frombuffer(out[0]["data"], np.uint8).reshape(8, 16)
    assert (got == np.hstack([lbl, m_fg])).all()
    # maximum below the fg tile's share keeps only the EMPTY tile (share
    # 0.0 is inside [0, 0.2] — the reference's >=min and <=max rule)
    kept = compare_composites(labels, [masks], maximum=0.2).collect()
    assert [r["x"] for r in kept] == [11]

    # a dimension-mismatched mask must fail loudly, not garble (the
    # reference asserts image.size == mask.size per tile)
    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    bad = spark.createDataFrame(
        # same 64-byte payload, different declared dims (16x4 vs 8x8)
        [(18, 10, 20, 16, 4, m_fg.reshape(4, 16).copy().tobytes())], schema
    )
    with pytest.raises(PythonException, match="16x4, label is 8x8"):
        compare_composites(labels, [bad]).collect()

    # CLI end-to-end: metrics parquet + composite PNG roundtrip
    ldir, mdir = str(tmp_path / "l"), str(tmp_path / "m")
    labels.write.parquet(ldir); masks.write.parquet(mdir)
    comp = str(tmp_path / "comp")
    main(["compare", "--masks", mdir, "--truth", ldir,
          "--out", str(tmp_path / "metrics"),
          "--composites", comp, "--minimum", "0.1"], spark=spark)
    png = open(f"{comp}/18/10/20.png", "rb").read()
    arr, _palette = decode_png(png)
    assert arr.shape == (8, 16)
    assert (arr == np.hstack([lbl, m_fg])).all()  # bit-exact through the codec
