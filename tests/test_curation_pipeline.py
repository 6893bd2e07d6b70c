"""End-to-end curation DAG (plans/curation): the text operators compose
under the checkpointed Pipeline runner with stage-level resume and
lineage metrics."""

import pytest
from pyspark.sql import functions as F

from robosat_spark.plans.curation import curate_corpus

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_curation_pipeline_end_to_end_and_resume(spark, tmp_path):
    root = str(tmp_path / "curate")

    p = curate_corpus(spark, DOCS, root)
    stages = ["quality", "dedup", "linecut", "spancut", "scored", "curated", "packed"]
    assert [s for s in stages if p.ran[s]] == stages  # first run computes all

    curated = spark.read.parquet(f"{root}/curated")
    assert {"doc_id", "text", "quality", "lang_pred", "n_lines_cut",
            "n_tokens_cut", "n_bigrams", "ppl"} == set(curated.columns)
    n_raw = spark.read.parquet(DOCS).count()
    n_cur = curated.count()
    assert 0 < n_cur <= n_raw
    # quality floor held, every surviving doc has text, ppl is populated
    assert curated.filter("quality < 0.3").count() == 0
    assert curated.filter(F.length(F.trim("text")) == 0).count() == 0
    assert curated.filter("ppl IS NULL AND n_bigrams > 0").count() == 0

    packed = spark.read.parquet(f"{root}/packed")
    assert {"tok_offset", "seq_first", "seq_last"} <= set(packed.columns)
    assert packed.count() > 0

    # second run: every stage resumes from its commit, outputs identical
    p2 = curate_corpus(spark, DOCS, root)
    assert not any(p2.ran.values())
    assert sorted(map(tuple, spark.read.parquet(f"{root}/curated").collect())) == \
        sorted(map(tuple, curated.collect()))

    # invalidating one stage recomputes exactly that stage
    p2.invalidate("scored")
    p3 = curate_corpus(spark, DOCS, root)
    assert p3.ran["scored"] and not p3.ran["spancut"] and not p3.ran["curated"]

    # lineage metrics recorded one row-set per stage with upstream edges
    m = p3.metrics()
    assert set(r["stage"] for r in m.select("stage").distinct().collect()) == set(stages)
    up = {r["stage"]: r["upstream"] for r in m.select("stage", "upstream").distinct().collect()}
    assert up["curated"] == ["spancut", "scored"] and up["packed"] == ["curated"]


def test_curation_pipeline_content_flows(spark, tmp_path):
    """The cleaning stages demonstrably act: a planted boilerplate line and
    a duplicated passage vanish from the curated text; the exact dup
    keeps one survivor."""
    rows = [
        (1, "COOKIE BANNER\nreal content about rivers and tiles flowing north", "en"),
        (2, "COOKIE BANNER\nother real content about mountains and valleys here", "en"),
        (3, "unique passage repeated verbatim inside this corpus body today extra", "en"),
        (4, "unique passage repeated verbatim inside this corpus body today extra", "en"),
    ]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING") \
        .write.parquet(docs_path)
    curate_corpus(spark, docs_path, str(tmp_path / "c"), min_quality=0.0)
    cur = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "c") + "/curated").collect()}
    # exact dedup: doc 4 gone, doc 3 survives with its text intact
    assert 4 not in cur and 3 in cur
    # boilerplate line cut from both docs 1 and 2, content kept
    assert "COOKIE BANNER" not in cur[1].text and "rivers" in cur[1].text
    assert "COOKIE BANNER" not in cur[2].text and "mountains" in cur[2].text
    assert cur[1].n_lines_cut == 1 and cur[2].n_lines_cut == 1


def test_curation_pipeline_from_raw_wet(spark, tmp_path):
    """input_kind='wet': raw crawl archives -> curated table -> packed
    shards in one resumable run."""
    from robosat_spark.sources.warc import gzip_members_bytes

    recs = [{"warc_type": "conversion", "record_id": f"<urn:uuid:{i}>",
             "target_uri": f"https://site{i}.com/page", "warc_date": "2026-08-18T00:00:00Z",
             "content_type": "text/plain",
             "payload": f"the quick brown fox number {i} jumps over the lazy dog and "
                        f"keeps running through the long meadow beyond the river"}
            for i in range(4)]
    (tmp_path / "crawl.warc.gz").write_bytes(gzip_members_bytes(recs))
    p = curate_corpus(spark, str(tmp_path / "crawl.warc.gz"), str(tmp_path / "c"),
                      min_quality=0.0, input_kind="wet")
    assert all(p.ran.values())
    cur = spark.read.parquet(str(tmp_path / "c") + "/curated")
    assert cur.count() == 4 and "ppl" in cur.columns
    assert spark.read.parquet(str(tmp_path / "c") + "/packed").count() > 0
