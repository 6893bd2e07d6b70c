"""Multimodal binary-column plumbing: sniffing, decode stub, resize."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from robosat_spark.functions.multimodal import (
    decode_images,
    fake_decode_bytes,
    media_meta,
    resize_decoded,
    sample_frames,
    sniff_format,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\0" * 24
JPeg = b"\xff\xd8\xff\xe0" + b"\0" * 24
WEBP = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"\0" * 16
WAV = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"\0" * 16


@pytest.fixture(scope="module")
def media(spark):
    rows = [("a", PNG), ("b", JPeg), ("c", WEBP), ("d", WAV), ("e", b"<html><body>x</body></html>")]
    return spark.createDataFrame(rows, "url STRING, data BINARY")


def test_sniff_format(spark, media):
    got = {r["url"]: r["fmt"] for r in media.select("url", sniff_format(F.col("data")).alias("fmt")).collect()}
    assert got == {"a": "png", "b": "jpeg", "c": "webp", "d": "wav", "e": "html"}


def test_media_meta_struct(spark, media):
    row = media.filter(F.col("url") == "a").select(media_meta(F.col("data")).alias("m")).collect()[0]["m"]
    assert row["format"] == "png" and row["n_bytes"] == len(PNG)


def test_decode_stub_raises_without_fake(spark, media):
    """fake=False error contract. The Spark plan surfaces SOME execution
    error (which payload's task dies first is scheduler-dependent — the
    old message assertion raced on it); the per-format error contract is
    pinned kernel-side, where it is deterministic."""
    df = decode_images(media, key_col="url", data_col="data", fake=False)
    with pytest.raises(Exception):
        df.count()
    from robosat_spark.kernels.png import decode_png
    from robosat_spark.kernels.webp import decode_webp

    with pytest.raises(ValueError):  # PNG magic, truncated body
        decode_png(PNG)
    with pytest.raises(Exception):  # JPEG SOI then garbage
        import robosat_spark.kernels.jpeg as J

        J.decode_jpeg(JPeg)
    with pytest.raises(ValueError, match="VP8L"):  # RIFF/WEBP, no VP8L chunk
        decode_webp(WEBP)
    # unknown format: a single-payload frame has exactly one task, so the
    # documented stub message is the deterministic plan-level error
    only_html = media.filter(F.col("url") == "e").coalesce(1)
    with pytest.raises(Exception, match="implemented from"):
        decode_images(only_html, key_col="url", data_col="data", fake=False).count()


def test_fake_decode_deterministic_and_resize(spark, media):
    decoded = decode_images(media, key_col="url", data_col="data", h=32, w=48, fake=True)
    rows = {r["key"]: r for r in decoded.collect()}
    assert set(rows) == {"a", "b", "c", "d", "e"}
    assert all(r["h"] == 32 and r["w"] == 48 and r["channels"] == 1 for r in rows.values())
    # determinism: same payload -> same pixels (local kernel == cluster result)
    local = fake_decode_bytes(PNG, 32, 48, 1)
    assert bytes(rows["a"]["pixels"]) == local.tobytes()

    resized = resize_decoded(decoded, 16, 16)
    r = {x["key"]: x for x in resized.collect()}["a"]
    grid = np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(16, 16, 1)
    yi = (np.arange(16) * 32 // 16).astype(int)
    xi = (np.arange(16) * 48 // 16).astype(int)
    assert np.array_equal(grid, local[yi[:, None], xi[None, :], :])


def test_sample_frames(spark):
    df = spark.createDataFrame([(100,), (1,), (0,)], "n INT")
    got = [r["f"] for r in df.select(sample_frames(F.col("n"), every=30).alias("f")).collect()]
    assert got[0] == [0, 30, 60, 90]
    assert got[1] == [0]
    assert got[2] == [0]


def test_wav_codec_roundtrip_and_audio_features(spark):
    """Real WAV/PCM decode (stdlib struct): encode->decode roundtrip and
    the audio feature-extract operator over a binary column, including
    magic-sniff agreement ('wav' via the RIFF subtype)."""
    import numpy as np
    import pyspark.sql.functions as F

    from robosat_spark.functions.multimodal import (
        audio_features,
        decode_wav_bytes,
        encode_wav_bytes,
        sniff_format,
    )

    t = np.arange(8000, dtype=np.float64)
    tone = (np.sin(2 * np.pi * 440 * t / 8000) * 10000).astype(np.int16)
    payload = encode_wav_bytes(tone, rate=8000)
    rate, ch, s = decode_wav_bytes(payload)
    assert (rate, ch) == (8000, 1) and np.array_equal(s[:, 0], tone)

    df = spark.createDataFrame([("a1", bytearray(payload))], "url STRING, html BINARY")
    assert df.select(sniff_format(F.col("html")).alias("f")).collect()[0]["f"] == "wav"
    row = audio_features(df).collect()[0]
    assert row["sample_rate"] == 8000 and row["channels"] == 1
    assert row["n_frames"] == 8000
    # RMS of a full-cycle sine = amplitude/sqrt(2)
    assert abs(row["rms"] - 10000 / np.sqrt(2)) / (10000 / np.sqrt(2)) < 0.01


def test_decode_images_truncated_png_falls_back_to_stub(spark):
    """PNG magic + truncated body must hit the documented fallback: stub
    under fake=True, ValueError (not struct/zlib errors) under fake=False."""
    import pytest

    from robosat_spark.functions.multimodal import decode_images
    from robosat_spark.kernels.png import decode_png

    bad = b"\x89PNG\r\n\x1a\n" + b"\x00\x01"
    with pytest.raises(ValueError):
        decode_png(bad)
    df = spark.createDataFrame([("u", bytearray(bad))], "url STRING, html BINARY")
    out = decode_images(df, fake=True, h=4, w=4).collect()
    assert len(out) == 1 and out[0]["h"] == 4  # stub engaged
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        decode_images(df, fake=False).collect()
