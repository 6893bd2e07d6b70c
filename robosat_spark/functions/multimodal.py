"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
Spark-side contract a 100 TB training-data pipeline needs: schema, Arrow
batch shape, partitioning, and UDF signatures are real and tested. PNG
decode is REAL (the from-scratch stdlib-zlib codec in kernels.png — the
only format the reference pipeline itself produces/consumes); other codecs
(JPEG/WebP/video) need native libs absent in this container, so they raise
``NotImplementedError`` unless the deterministic fake decoder is requested
(seeded uint8 grid, same shape/dtype contract).

Format sniffing is JVM-side (magic-byte prefix compare on the binary
column), so scans that only need routing-by-format never deserialize
payloads into Python.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# magic prefixes, hex-encoded (compared against hex(substring(data, 1, n)))
_MAGIC = [
    ("png", "89504E47"),
    ("jpeg", "FFD8FF"),
    ("gif", "47494638"),
    ("webp_riff", "52494646"),  # RIFF container: WEBP or WAV, see below
    ("pdf", "25504446"),
    ("html", "3C68746D6C"),  # "<html"
]


def sniff_format(data: Column) -> Column:
    """Magic-byte format sniff of a binary column — pure JVM expression."""
    head = F.upper(F.hex(F.substring(data, 1, 16)))
    out = F.lit("unknown")
    # RIFF needs the subtype at offset 9..12
    sub = F.upper(F.hex(F.substring(data, 9, 4)))
    for name, magic in reversed(_MAGIC):
        cond = head.startswith(magic)
        if name == "webp_riff":
            fmt = F.when(sub == F.lit("57454250"), "webp").when(
                sub == F.lit("57415645"), "wav"
            ).otherwise("riff")
            out = F.when(cond, fmt).otherwise(out)
        else:
            out = F.when(cond, F.lit(name)).otherwise(out)
    return out


def media_meta(data: Column) -> Column:
    """(format, n_bytes) struct — the typed metadata column."""
    return F.struct(
        sniff_format(data).alias("format"), F.length(data).alias("n_bytes")
    )


DECODED_SCHEMA = "key STRING, h INT, w INT, channels INT, pixels BINARY"


def fake_decode_bytes(payload: bytes, h: int = 64, w: int = 64, channels: int = 1) -> np.ndarray:
    """Deterministic stand-in decoder: a seeded uint8 grid derived from the
    payload hash. Shape/dtype contract identical to a real decoder."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.RandomState(int(seed % (2**31)))
    return rng.randint(0, 256, size=(h, w, channels), dtype=np.uint8)


def decode_images(
    df: DataFrame,
    key_col: str = "url",
    data_col: str = "html",
    h: int = 64,
    w: int = 64,
    channels: int = 1,
    fake: bool = False,
) -> DataFrame:
    """binary column -> (key, h, w, channels, pixels) via Arrow batches.

    ``fake=True`` honors the stub contract UNCONDITIONALLY: every payload
    (valid PNGs included) yields the deterministic fixed-shape
    ``fake_decode_bytes`` grid, so callers get a stable (h, w, channels)
    regardless of payload contents. ``fake=False`` decodes for real: PNG,
    baseline JPEG, and lossless WebP (VP8L) via the from-scratch kernels
    (palette PNGs yield the class-INDEX grid, matching the mask-pipeline
    contract); lossy-WebP/video raise NotImplementedError at
    plan-execution time (a different codec family; native libs absent
    here). The Spark plumbing — column pruning before the UDF, Arrow
    batch iteration, output schema — is the real production shape either
    way."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernels.png import decode_png

        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[data_col]):
                payload = bytes(payload)
                if fake:
                    grid = fake_decode_bytes(payload, h, w, channels)
                    rows.append((key, h, w, channels, grid.tobytes()))
                    continue
                if payload[:8] == b"\x89PNG\r\n\x1a\n":
                    grid, _pal = decode_png(payload)
                elif payload[:3] == b"\xff\xd8\xff":
                    from ..kernels.jpeg import decode_jpeg

                    grid = decode_jpeg(payload)
                elif payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
                    from ..kernels.webp import decode_webp

                    grid = decode_webp(payload)  # VP8L; lossy VP8 raises
                else:
                    raise NotImplementedError(
                        "only PNG/baseline-JPEG/lossless-WebP decode is "
                        "implemented from scratch (lossy WebP and video need "
                        "native libs absent in this environment); pass "
                        "fake=True for the deterministic stub"
                    )
                if grid.ndim == 2:
                    grid = grid[:, :, None]
                rows.append(
                    (key, grid.shape[0], grid.shape[1], grid.shape[2], grid.tobytes())
                )
            if rows:
                yield pd.DataFrame(rows, columns=["key", "h", "w", "channels", "pixels"])

    # select exactly the needed columns BEFORE the UDF: Arrow ships whole
    # projected rows, so pruning here is the scan-side optimization
    return df.select(key_col, data_col).mapInPandas(gen, DECODED_SCHEMA)


def resize_decoded(decoded: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize of decoded grids (pure NumPy, vectorized)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                grid = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(
                    r["h"], r["w"], r["channels"]
                )
                yi = (np.arange(out_h) * r["h"] // out_h).astype(np.intp)
                xi = (np.arange(out_w) * r["w"] // out_w).astype(np.intp)
                out = grid[yi[:, None], xi[None, :], :]
                rows.append((r["key"], out_h, out_w, r["channels"], out.tobytes()))
            if rows:
                yield pd.DataFrame(rows, columns=["key", "h", "w", "channels", "pixels"])

    return decoded.mapInPandas(gen, DECODED_SCHEMA)


def decode_wav_bytes(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM decode via the stdlib ``wave`` module: ->
    (sample_rate, n_channels, int16 samples[frames, channels]). 16-bit
    PCM; other encodings raise ValueError. (Unlike PNG, the stdlib already
    ships a WAV parser — no reason to hand-roll the chunk walk.)"""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(f"only 16-bit PCM supported (width={w.getsampwidth()})")
            rate, channels = w.getframerate(), w.getnchannels()
            raw = w.readframes(w.getnframes())
    except wave.Error as e:
        raise ValueError(f"malformed WAV: {e}") from e
    samples = np.frombuffer(raw, dtype="<i2")
    frames = len(samples) // channels
    return rate, channels, samples[: frames * channels].reshape(frames, channels)


def encode_wav_bytes(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples[frames, channels] -> RIFF/WAVE PCM bytes (stdlib
    ``wave`` writer)."""
    import io
    import wave

    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(s.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(s.tobytes())
    return buf.getvalue()


AUDIO_SCHEMA = "key STRING, sample_rate INT, channels INT, n_frames LONG, rms DOUBLE"


def audio_features(df: DataFrame, key_col: str = "url", data_col: str = "html") -> DataFrame:
    """WAV binary column -> (key, sample_rate, channels, n_frames, rms):
    the audio feature-extract leg of the multimodal contract, real decode
    via :func:`decode_wav_bytes` in Arrow batches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[key_col], pdf[data_col]):
                rate, ch, s = decode_wav_bytes(bytes(payload))
                rms = float(np.sqrt(np.mean(s.astype(np.float64) ** 2))) if len(s) else 0.0
                rows.append((key, rate, ch, s.shape[0], rms))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["key", "sample_rate", "channels", "n_frames", "rms"]
                )

    return df.select(key_col, data_col).mapInPandas(gen, AUDIO_SCHEMA)


def sample_frames(n_frames: Column, every: int = 30) -> Column:
    """Deterministic frame-sampling offsets for a video column: frame
    indices 0, every, 2*every, ... < n_frames (JVM sequence — the schema
    contract for a frame extractor)."""
    return F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every)
    )
