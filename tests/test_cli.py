"""CLI dispatcher (`python -m robosat_spark <tool>`): the rs-tool chain
cover -> rasterize -> predict -> features -> merge -> dedupe -> assign
end-to-end over files, in-process with a shared session."""

import pyspark.sql.functions as F

from robosat_spark.__main__ import main


def test_cli_full_chain(spark, tmp_path):
    from robosat_spark.sources.fixtures import features
    from robosat_spark.sources.pages import pages

    ft_path = str(tmp_path / "features")
    features(spark).filter(F.col("feature_id") < 2).write.parquet(ft_path)
    pages_path = str(tmp_path / "pages")
    pages(spark, 2000).write.parquet(pages_path)

    cover_out = str(tmp_path / "tiles")
    main(["cover", "--features", ft_path, "--zoom", "18", "--out", cover_out], spark=spark)
    tiles = spark.read.schema("x INT, y INT, z INT").csv(cover_out)
    n_tiles = tiles.count()
    assert n_tiles > 0

    masks_out = str(tmp_path / "masks")
    main(["rasterize", "--features", ft_path, "--tiles", cover_out, "--zoom", "18",
          "--size", "128", "--out", masks_out], spark=spark)
    masks = spark.read.parquet(masks_out)
    assert masks.count() == n_tiles

    pred_out = str(tmp_path / "pred")
    main(["predict", "--masks", masks_out, "--noise", "0.01", "--out", pred_out], spark=spark)
    assert spark.read.parquet(pred_out).count() == n_tiles

    feats_out = str(tmp_path / "vfeatures")
    main(["features", "--masks", pred_out, "--out", feats_out], spark=spark)
    vf = spark.read.parquet(feats_out)
    assert vf.count() > 0 and "rings" in vf.columns

    merged_out = str(tmp_path / "merged.geojson")
    main(["merge", "--features", feats_out, "--threshold", "20", "--out", merged_out], spark=spark)
    import json

    fc = json.load(open(merged_out))
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) > 0

    dedup_out = str(tmp_path / "kept")
    main(["dedupe", "--pred", feats_out, "--osm", ft_path, "--threshold", "0.5",
          "--out", dedup_out], spark=spark)
    kept = spark.read.parquet(dedup_out)
    # per-tile extraction yields tile-clipped fragments, so fragment-vs-
    # whole IoU stays under the threshold and fragments are kept; the
    # verdict path itself is golden-tested in test_mask_pipeline
    assert 0 < kept.count() <= vf.count()
    assert "feature_id" in kept.columns

    assign_out = str(tmp_path / "assigned")
    main(["assign", "--pages", pages_path, "--features", ft_path, "--zoom", "18",
          "--out", assign_out], spark=spark)
    assert spark.read.parquet(assign_out).count() > 0

    # subset: keep only the first 2 cover tiles
    small_csv = str(tmp_path / "subset.csv")
    with open(small_csv, "w") as fh:
        for r in tiles.limit(2).collect():
            fh.write(f"{r['x']},{r['y']},{r['z']}\n")
    subset_out = str(tmp_path / "subset_masks")
    main(["subset", "--tiles", small_csv, "--masks", masks_out, "--out", subset_out],
         spark=spark)
    assert spark.read.parquet(subset_out).count() == 2

    # masks: probs -> argmax masks (predict output doubles as probs input)
    masks2_out = str(tmp_path / "masks2")
    main(["masks", "--probs", masks_out, "--out", masks2_out], spark=spark)
    assert spark.read.parquet(masks2_out).count() == n_tiles

    # compare: prediction vs truth -> one metrics row with sane bounds
    cmp_out = str(tmp_path / "metrics")
    main(["compare", "--masks", pred_out, "--truth", masks_out, "--out", cmp_out],
         spark=spark)
    m = spark.read.parquet(cmp_out).collect()
    assert len(m) == 1 and 0.0 <= m[0]["miou"] <= 1.0

    # rasterize --format png: reference slippy z/x/y.png layout, decodable
    png_out = str(tmp_path / "slippy_png")
    main(["rasterize", "--features", ft_path, "--tiles", small_csv, "--zoom", "18",
          "--size", "64", "--format", "png", "--out", png_out], spark=spark)
    import glob

    pngs = glob.glob(png_out + "/*/*/*.png")
    assert len(pngs) == 2
    from robosat_spark.kernels.png import decode_png

    img, pal = decode_png(open(pngs[0], "rb").read())
    assert img.shape == (64, 64) and pal is not None

    # serve analog returns PNG bytes for a tile in the parquet layout
    from robosat_spark.operators.serve import serve_tile_png

    grids = spark.read.parquet(masks_out)
    first = grids.select("z", "x", "y").first()
    png_bytes = serve_tile_png(grids, first["z"], first["x"], first["y"],
                               palette=[255, 255, 255, 48, 96, 176])
    assert png_bytes is not None
    img2, _ = decode_png(png_bytes)
    assert img2.shape == (128, 128)

    # weights: two classes, weights positive, background outweighed
    w_out = str(tmp_path / "weights")
    main(["weights", "--masks", masks_out, "--classes", "2", "--out", w_out], spark=spark)
    w = {r["class"]: r["weight"] for r in spark.read.parquet(w_out).collect()}
    assert set(w) == {0, 1} and all(v > 0 for v in w.values())
    assert w[1] > w[0]  # foreground is rarer -> larger weight


def test_cli_download_local_template_resume(spark, tmp_path):
    """`download`: local {z}/{x}/{y} template -> slippy dir, skip-existing
    resume (pre-existing tile bytes untouched on rerun)."""
    import os

    # source "tile server": a local slippy tree with distinct bytes per tile
    src = tmp_path / "src"
    tiles = [(18, 1, 1), (18, 1, 2), (18, 2, 1)]
    for z, x, y in tiles:
        d = src / str(z) / str(x)
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{y}.png").write_bytes(f"tile-{z}-{x}-{y}".encode())
    csv = tmp_path / "tiles.csv"
    csv.write_text("".join(f"{x},{y},{z}\n" for z, x, y in tiles))

    out = tmp_path / "dl"
    # pre-plant one tile with sentinel bytes: download must SKIP it
    (out / "18" / "1").mkdir(parents=True)
    (out / "18" / "1" / "1.png").write_bytes(b"sentinel")

    tpl = str(src) + "/{z}/{x}/{y}.png"
    main(["download", "--tiles", str(csv), "--url", tpl, "--out", str(out),
          "--rate", "1000"], spark=spark)

    assert (out / "18" / "1" / "1.png").read_bytes() == b"sentinel"  # skipped
    assert (out / "18" / "1" / "2.png").read_bytes() == b"tile-18-1-2"
    assert (out / "18" / "2" / "1.png").read_bytes() == b"tile-18-2-1"
    assert not any(f.endswith(".tmp") for f in os.listdir(out / "18" / "1"))


def test_cli_table_maintenance(spark, tmp_path, capsys):
    """`table` subcommand: snapshots / delete / compact(sort_by) / expire
    drive the Iceberg maintenance actions end-to-end over files."""
    from robosat_spark.__main__ import main
    from robosat_spark.sources.iceberg import IcebergTable, write_iceberg

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [((i * 7919) % 1000, i) for i in range(1000)], "morton LONG, id LONG"
    ).repartition(4)
    write_iceberg(spark, df, path, stats_cols=("morton",))

    main(["table", "delete", "--path", path, "--where", "id:<:100"], spark=spark)
    assert IcebergTable(path).scan(spark).count() == 900
    main(["table", "compact", "--path", path, "--target-files", "4",
          "--sort-by", "morton"], spark=spark)
    t = IcebergTable(path)
    assert t.scan(spark).count() == 900
    _tasks, rep = t.plan_files(filters=[("morton", "<", 100)])
    assert rep["files_pruned"] >= 2, rep
    main(["table", "expire", "--path", path, "--keep-last", "1"], spark=spark)
    assert len(IcebergTable(path).snapshots()) == 1
    main(["table", "snapshots", "--path", path], spark=spark)
    out = capsys.readouterr().out
    assert "op=replace" in out

    # r5 ADVICE: missing/malformed --where is a usage error, not a crash
    import pytest

    with pytest.raises(SystemExit, match="requires --where"):
        main(["table", "delete", "--path", path], spark=spark)
    with pytest.raises(SystemExit, match="requires --where"):
        main(["table", "delete", "--path", path, "--where", "id<100"], spark=spark)
    with pytest.raises(SystemExit, match="unsupported delete op"):
        main(["table", "delete", "--path", path, "--where", "id:!=:100"], spark=spark)

    # upsert via CLI: MERGE-by-key (new row version supersedes)
    changes = str(tmp_path / "changes")
    spark.createDataFrame([(999, 555)], "morton LONG, id LONG").write.parquet(changes)
    main(["table", "upsert", "--path", path, "--data", changes, "--keys", "id"],
         spark=spark)
    t = IcebergTable(path)
    assert t.scan(spark, filters=[("id", "=", 555)]).first()["morton"] == 999
    assert t.scan(spark).count() == 900  # 555 superseded, not duplicated
    with pytest.raises(SystemExit, match="requires --data"):
        main(["table", "upsert", "--path", path], spark=spark)
    with pytest.raises(SystemExit, match="not in --data"):
        main(["table", "upsert", "--path", path, "--data", changes,
              "--keys", "nope"], spark=spark)
    # duplicate key tuples in --data would append BOTH versions after one
    # delete — rejected before any snapshot commits
    dup = str(tmp_path / "dup")
    spark.createDataFrame([(1, 777), (2, 777)], "morton LONG, id LONG").write.parquet(dup)
    with pytest.raises(SystemExit, match="duplicate"):
        main(["table", "upsert", "--path", path, "--data", dup, "--keys", "id"],
             spark=spark)
    assert IcebergTable(path).scan(spark).count() == 900  # nothing committed


def test_cli_table_write(spark, tmp_path, capsys):
    """`table write`: parquet -> Iceberg table creation from the CLI,
    identity and bucket[N] partition layouts, arg validation."""
    import pytest

    from robosat_spark.__main__ import main
    from robosat_spark.sources.iceberg import IcebergTable

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i % 7, (i * 7919) % 1000, i) for i in range(1000)],
        "k LONG, morton LONG, id LONG",
    ).repartitionByRange(4, "morton").write.parquet(src)

    # plain write with file stats
    path = str(tmp_path / "tbl")
    main(["table", "write", "--path", path, "--data", src,
          "--stats", "morton"], spark=spark)
    out = capsys.readouterr().out
    assert "wrote snapshot 1" in out
    t = IcebergTable(path)
    assert t.scan(spark).count() == 1000
    _tasks, rep = t.plan_files(filters=[("morton", "<", 100)])
    assert rep["files_pruned"] >= 2, rep  # --stats carried min/max bounds

    # bucket[N] partitioned write: point lookup prunes to ~1/N of files
    bpath = str(tmp_path / "tbl_bucket")
    main(["table", "write", "--path", bpath, "--data", src,
          "--partition-by", "k", "--transform", "bucket[4]"], spark=spark)
    assert "bucket[4](k)" in capsys.readouterr().out
    bt = IcebergTable(bpath)
    assert bt.scan(spark).count() == 1000
    _tasks, rep = bt.plan_files(filters=[("k", "=", 3)])
    assert rep["files_pruned"] >= 1, rep

    # arg validation: all usage errors, none commit anything
    with pytest.raises(SystemExit, match="requires --data"):
        main(["table", "write", "--path", path], spark=spark)
    with pytest.raises(SystemExit, match="not in --data"):
        main(["table", "write", "--path", path, "--data", src,
              "--partition-by", "nope"], spark=spark)
    with pytest.raises(SystemExit, match="identity or bucket"):
        main(["table", "write", "--path", path, "--data", src,
              "--partition-by", "k", "--transform", "hash[4]"], spark=spark)
    with pytest.raises(SystemExit, match="requires --partition-by"):
        main(["table", "write", "--path", path, "--data", src,
              "--transform", "bucket[4]"], spark=spark)
    with pytest.raises(SystemExit, match="--stats columns not in --data"):
        main(["table", "write", "--path", path, "--data", src,
              "--stats", "morton,nope"], spark=spark)
    assert len(IcebergTable(path).snapshots()) == 1  # nothing extra committed


def test_cli_curate_and_sketch(spark, tmp_path, capsys):
    """`curate` (blocklist + quality floor + redaction) and `sketch`
    (HLL/CMS register artifacts) drive the corpus-curation ops e2e."""
    from robosat_spark.__main__ import main

    pages = spark.createDataFrame(
        [
            (1, "https://www.bbc.co.uk/a", "good text with enough words to pass " * 5),
            (2, "https://x.spam.biz/b", "short"),
            (3, "https://ok.example.com/c", "contact me a@b.io now " * 10),
        ],
        "id LONG, url STRING, text STRING",
    )
    src = str(tmp_path / "pages"); pages.write.parquet(src)
    # mixed-case entry + comment line: both must normalize (the join key
    # is lowercased eTLD+1, so 'Spam.BIZ' would otherwise never match)
    bl = tmp_path / "bl.txt"; bl.write_text("# ad networks\nSpam.BIZ\n")
    out = str(tmp_path / "kept")
    main(["curate", "--pages", src, "--out", out, "--blocklist", str(bl),
          "--redact"], spark=spark)
    kept = spark.read.parquet(out)
    ids = {r["id"] for r in kept.collect()}
    assert ids == {1, 3}  # spam.biz dropped via registered domain
    texts = {r["id"]: r["text"] for r in kept.collect()}
    assert "<EMAIL>" in texts[3] and "a@b.io" not in texts[3]

    regs_out = str(tmp_path / "hll_regs")
    main(["sketch", "hll", "--path", src, "--col", "url", "--out", regs_out,
          "--p", "8"], spark=spark)
    assert "estimated" in capsys.readouterr().out
    assert spark.read.parquet(regs_out).count() <= 256
    main(["sketch", "cms", "--path", src, "--col", "url", "--w", "64"],
         spark=spark)
    assert "counter table" in capsys.readouterr().out

    # `sketch merge`: per-slice register artifacts (one parquet, one
    # Iceberg) MAX-merge into the whole-table registers
    from robosat_spark.operators.sketch import hll_buckets
    from robosat_spark.sources.iceberg import write_iceberg

    docs = spark.read.parquet(src)
    s0 = str(tmp_path / "regs0")
    hll_buckets(docs.filter("id <= 1"), "url", p=8).write.parquet(s0)
    s1 = str(tmp_path / "regs1")
    write_iceberg(spark, hll_buckets(docs.filter("id > 1"), "url", p=8), s1,
                  timestamp_ms=1000)
    merged_out = str(tmp_path / "merged")
    main(["sketch", "merge", "--rule", "hll", "--inputs", s0, s1,
          "--out", merged_out, "--p", "8"], spark=spark)
    assert "estimated" in capsys.readouterr().out
    want = {tuple(r) for r in hll_buckets(docs, "url", p=8).collect()}
    assert {tuple(r) for r in spark.read.parquet(merged_out).collect()} == want
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="--inputs"):
        main(["sketch", "merge", "--out", merged_out], spark=spark)


def test_cli_serve_http_roundtrip(spark, tmp_path):
    """`serve`: real HTTP GET /z/x/y.png against the stdlib server returns
    the same bytes as the direct serve_tile_png call; unknown tile -> 404."""
    import threading
    import urllib.error
    import urllib.request

    from robosat_spark.functions.colors import class_palette
    from robosat_spark.operators.serve import make_tile_server, serve_tile_png
    from robosat_spark.operators.rasterize import rasterize_masks
    from robosat_spark.sources.fixtures import features
    from robosat_spark.operators.cover import cover

    ft = features(spark).filter(F.col("feature_id") < 1)
    tiles = cover(ft, zoom=18).select("x", "y").limit(2)
    masks = rasterize_masks(spark, tiles, ft, zoom=18, size=64)
    root = str(tmp_path / "grids")
    masks.write.partitionBy("z", "x").parquet(root)
    grids = spark.read.parquet(root)
    first = grids.select("z", "x", "y").first()
    pal = class_palette(["white", "denim"])

    srv = make_tile_server(grids, port=0, palette=pal)  # port 0 = ephemeral
    port = srv.server_address[1]
    t = threading.Thread(target=srv.handle_request)
    t.start()
    url = f"http://127.0.0.1:{port}/{first['z']}/{first['x']}/{first['y']}.png"
    got = urllib.request.urlopen(url, timeout=30).read()
    t.join(timeout=60)
    want = serve_tile_png(grids, first["z"], first["x"], first["y"], palette=pal)
    assert got == want and got[:4] == b"\x89PNG"

    t2 = threading.Thread(target=srv.handle_request)
    t2.start()
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/9/9/9.png", timeout=30)
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    t2.join(timeout=60)

    # map preview page at / (reference parity: serve.py renders map.html):
    # HTML wiring the local /z/x/y.png layer into a Leaflet map
    t3 = threading.Thread(target=srv.handle_request)
    t3.start()
    page = urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=30).read().decode()
    t3.join(timeout=60)
    srv.server_close()
    assert status == 404
    assert "/{z}/{x}/{y}.png" in page and "leaflet" in page.lower()
    assert "L.map(" in page


def test_cli_index_build_and_query(spark, tmp_path, capsys):
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    table = str(tmp_path / "bm25_idx")
    main(["index", "build", "--docs", docs_path, "--table", table,
          "--buckets", "4"], spark=spark)
    out = capsys.readouterr().out
    assert "snapshot 1" in out and "bucket[4]" in out

    main(["index", "query", "--table", table, "--terms", "dup", "hash",
          "--top", "5"], spark=spark)
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert 0 < len(lines) <= 5
    # matches the direct-scan ranking
    from robosat_spark.operators.relevance import bm25_scores
    import pyspark.sql.functions as F

    direct = bm25_scores(spark.read.parquet(docs_path), ["dup", "hash"])
    want = [
        f"{r['doc_id']}\t{r['score']}"
        for r in direct.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(5).collect()
    ]
    assert lines == want


def test_cli_index_arg_validation(spark, tmp_path):
    import pytest

    with pytest.raises(SystemExit, match="requires --docs"):
        main(["index", "build", "--table", str(tmp_path / "t")], spark=spark)
    with pytest.raises(SystemExit, match="requires --terms"):
        main(["index", "query", "--table", str(tmp_path / "t")], spark=spark)


def test_cli_pack(spark, tmp_path, capsys):
    docs_path = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "packed")
    main(["pack", "--docs", docs_path, "--out", out, "--seq-tokens", "128"],
         spark=spark)
    msg = capsys.readouterr().out
    assert "chunks ->" in msg and "sequences" in msg
    got = spark.read.parquet(out)
    assert {"tok_offset", "seq_first", "seq_last", "seq_bucket"} <= set(got.columns)
    # offsets match the operator run directly (partitionBy round-trip safe)
    from robosat_spark.operators.chunking import chunk_documents, pack_chunks

    want = pack_chunks(
        chunk_documents(spark.read.parquet(docs_path)), seq_tokens=128
    )
    a = sorted(tuple(r) for r in got.select("doc_id", "chunk_idx", "tok_offset").collect())
    b = sorted(tuple(r) for r in want.select("doc_id", "chunk_idx", "tok_offset").collect())
    assert a == b and len(a) > 0


def test_cli_cut_tokenizer_score(spark, tmp_path, capsys):
    """The round-6 curation verbs end-to-end over files: cut (span + line),
    tokenizer (BPE merges), score (lm + dsir)."""
    docs_path = "/root/testdata/sf0.001/documents.parquet"

    out = str(tmp_path / "cut_span")
    main(["cut", "--docs", docs_path, "--out", out], spark=spark)
    assert "cut[span]:" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert {"doc_id", "clean_text", "n_removed"} == set(got.columns)
    assert got.count() == spark.read.parquet(docs_path).count()

    out = str(tmp_path / "cut_line")
    main(["cut", "--docs", docs_path, "--out", out, "--granularity", "line"],
         spark=spark)
    assert "cut[line]:" in capsys.readouterr().out

    out = str(tmp_path / "merges")
    main(["tokenizer", "--docs", docs_path, "--out", out, "--merges", "4"],
         spark=spark)
    msg = capsys.readouterr().out
    assert "4 merges" in msg and "tokens under the vocab" in msg
    merges = spark.read.parquet(out)
    assert merges.count() == 4
    from robosat_spark.operators.bpe import bpe_train

    want = sorted(tuple(r) for r in bpe_train(
        spark.read.parquet(docs_path), n_merges=4).collect())
    assert sorted(tuple(r) for r in merges.collect()) == want

    out = str(tmp_path / "lm")
    main(["score", "--docs", docs_path, "--out", out], spark=spark)
    assert "score[lm]: mean perplexity" in capsys.readouterr().out
    assert {"doc_id", "n_bigrams", "lp_micro", "ppl"} == set(
        spark.read.parquet(out).columns)

    out = str(tmp_path / "dsir")
    main(["score", "--docs", docs_path, "--out", out, "--mode", "dsir"],
         spark=spark)
    msg = capsys.readouterr().out
    assert "score[dsir]:" in msg and "docs selected" in msg
    sel = spark.read.parquet(out).filter("selected").count()
    assert 0 < sel < 500


def test_cli_pipeline(spark, tmp_path, capsys):
    """The curation-DAG verb runs end-to-end then resumes idempotently."""
    root = str(tmp_path / "pipe")
    main(["pipeline", "--docs", "/root/testdata/sf0.001/documents.parquet",
          "--root", root], spark=spark)
    msg = capsys.readouterr().out
    assert "pipeline: stages ran" in msg and "curated docs" in msg
    main(["pipeline", "--docs", "/root/testdata/sf0.001/documents.parquet",
          "--root", root], spark=spark)
    assert "(all resumed)" in capsys.readouterr().out


def test_cli_extract_wet(spark, tmp_path, capsys):
    from robosat_spark.sources.warc import gzip_members_bytes

    recs = [{"warc_type": "conversion", "record_id": f"<urn:uuid:{i}>",
             "target_uri": f"https://ex.com/{i}", "warc_date": "2026-08-18T00:00:00Z",
             "content_type": "text/plain", "payload": f"document body {i} words here"}
            for i in range(3)]
    (tmp_path / "crawl.warc.gz").write_bytes(gzip_members_bytes(recs))
    out = str(tmp_path / "docs")
    main(["extract", "--archives", str(tmp_path / "crawl.warc.gz"), "--out", out],
         spark=spark)
    assert "extract[wet]: 3 rows" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {"doc_id", "text", "url", "fetch_date", "n_chars"} == set(got.columns)
