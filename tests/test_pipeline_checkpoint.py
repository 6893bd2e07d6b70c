"""Checkpoint-resume + lineage metrics (A11/K6, north_rule requirement)."""

import pyspark.sql.functions as F
import pytest

from robosat_spark.plans import Pipeline, stage_metrics


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "job")


def test_stage_writes_and_metrics(spark, root):
    p = Pipeline(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    out = p.stage("doubles", build)
    assert out.count() == 100
    assert calls["n"] == 1
    assert p.ran["doubles"] is True

    m = stage_metrics(spark, root, "doubles")
    rows = m.collect()
    assert sum(r["rows"] for r in rows) == 100
    assert all(r["stage"] == "doubles" for r in rows)
    assert all(r["wall_ms"] > 0 for r in rows)


def test_resume_skips_committed_stage(spark, root):
    p = Pipeline(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    p.stage("s1", build)
    assert calls["n"] == 1

    # a fresh run (new driver) over the same root: stage is skipped
    p2 = Pipeline(spark, root)
    out = p2.stage("s1", build)
    assert calls["n"] == 1  # fn never invoked again
    assert p2.ran["s1"] is False
    assert out.count() == 10


def test_invalidate_forces_recompute(spark, root):
    p = Pipeline(spark, root)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10)

    p.stage("s1", build)
    p.invalidate("s1")
    p.stage("s1", build)
    assert calls["n"] == 2


def test_multi_stage_dag_resume(spark, root):
    """Kill-and-restart in the middle: finished upstream stages are reused."""
    p = Pipeline(spark, root)
    a = p.stage("a", lambda: spark.range(50))
    p.stage("b", lambda: a.filter(F.col("id") % 2 == 0), upstream=["a"])

    # simulate loss of stage b only
    p.invalidate("b")
    p2 = Pipeline(spark, root)
    a2 = p2.stage("a", lambda: (_ for _ in ()).throw(AssertionError("a recomputed")))
    b2 = p2.stage("b", lambda: a2.filter(F.col("id") % 2 == 0), upstream=["a"])
    assert p2.ran["a"] is False and p2.ran["b"] is True
    assert b2.count() == 25

    m = stage_metrics(spark, root).collect()
    b_rows = [r for r in m if r["stage"] == "b"]
    assert sum(r["rows"] for r in b_rows) == 25
    assert all(list(r["upstream"]) == ["a"] for r in b_rows)
