"""From-scratch baseline JPEG codec: exact bitstream parity + round-trips.

The exact-parity test replicates the encoder's transform chain (fdct ->
quantize -> round) independently in the test and asserts the DECODER's
output equals idct(dequantized) bit-for-bit — so the Huffman/bitstream
layer (categories, runs, EOB/ZRL, byte stuffing, DC prediction) is verified
exactly, not just "looks close".
"""

import numpy as np
import pytest

from robosat_spark.kernels.jpeg import (
    _ZIGZAG,
    _scaled_q,
    _STD_LUMA_Q,
    decode_jpeg,
    encode_jpeg,
    fdct2,
    idct2,
)


def _expected_gray(img: np.ndarray, quality: int) -> np.ndarray:
    """Independent replay of quantize->dequantize->idct for grayscale."""
    h, w = img.shape
    q = _scaled_q(_STD_LUMA_Q, quality).astype(np.float64)
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    p = np.empty((bh, bw), dtype=np.float64)
    p[:h, :w] = img.astype(np.float64) - 128.0
    p[h:, :w] = p[h - 1 : h, :w]
    p[:, w:] = p[:, w - 1 : w]
    out = np.empty((bh, bw), dtype=np.float64)
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            coef = np.round(fdct2(p[by : by + 8, bx : bx + 8]) / q)
            out[by : by + 8, bx : bx + 8] = idct2(coef * q) + 128.0
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def test_idct_of_dc_only_block_is_flat():
    block = np.zeros((8, 8))
    block[0, 0] = 80.0
    assert np.allclose(idct2(block), 10.0)


def test_fdct_idct_inverse_pair():
    rng = np.random.RandomState(7)
    b = rng.rand(8, 8) * 255 - 128
    assert np.allclose(idct2(fdct2(b)), b, atol=1e-9)


def test_flat_gray_roundtrip_exact():
    img = np.full((16, 24), 128, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=90)), img)


def test_gray_bitstream_exact_parity():
    """Decoder output == independent transform replay, bit for bit."""
    rng = np.random.RandomState(42)
    # smooth + noise + hard edges: exercises EOB, ZRL, long runs, stuffing
    gx, gy = np.meshgrid(np.arange(40), np.arange(24))
    img = (gx * 3 + gy * 5 + rng.randint(0, 40, size=(24, 40))).astype(np.uint8)
    img[5:9, :] = 255
    img[:, 10:12] = 0
    for quality in (25, 75, 95):
        got = decode_jpeg(encode_jpeg(img, quality=quality))
        assert np.array_equal(got, _expected_gray(img, quality)), quality


def test_gray_roundtrip_tolerance_and_shape():
    rng = np.random.RandomState(3)
    img = rng.randint(100, 140, size=(17, 31), dtype=np.uint8)  # non-multiple of 8
    got = decode_jpeg(encode_jpeg(img, quality=95))
    assert got.shape == (17, 31)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 12


def test_color_roundtrip_tolerance():
    gx, gy = np.meshgrid(np.arange(32), np.arange(16))
    img = np.stack(
        [(gx * 8).astype(np.uint8), (gy * 8).astype(np.uint8), np.full((16, 32), 60, np.uint8)],
        axis=-1,
    )
    got = decode_jpeg(encode_jpeg(img, quality=95))
    assert got.shape == (16, 32, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 16


def test_rejects_progressive_and_garbage():
    img = np.full((8, 8), 90, dtype=np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_decode_images_real_jpeg(spark):
    from robosat_spark.functions.multimodal import decode_images

    img = np.full((8, 16), 128, dtype=np.uint8)
    payload = encode_jpeg(img, quality=90)
    df = spark.createDataFrame([("j1", bytearray(payload))], "url STRING, data BINARY")
    rows = decode_images(df, key_col="url", data_col="data", fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["h"], r["w"], r["channels"]) == (8, 16, 1)
    assert np.frombuffer(bytes(r["pixels"]), dtype=np.uint8).reshape(8, 16).tolist() == img.tolist()
