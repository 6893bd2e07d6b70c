"""From-scratch VP8L (WebP lossless) codec: round-trips + hand-built
bitstreams exercising the decoder paths the baseline encoder never emits
(LZ77 backrefs, color cache, subtract-green, palette bundling, predictor).
"""

import numpy as np
import pytest

from robosat_spark.kernels.webp import (
    DISTANCE_MAP,
    SIGNATURE,
    BitReaderLSB,
    BitWriterLSB,
    _prefix_encode,
    _prefix_value,
    _write_channel_code,
    decode_webp,
    encode_webp,
)


def _rgba(img):
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[2] == 3:
        img = np.concatenate([img, np.full(img.shape[:2] + (1,), 255, np.uint8)], -1)
    return img


def test_roundtrip_shapes_and_values():
    rng = np.random.RandomState(7)
    cases = [
        rng.randint(0, 256, (13, 17, 4), dtype=np.uint8),
        rng.randint(0, 256, (9, 9), dtype=np.uint8),
        (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255,
        np.full((5, 6, 3), 77, np.uint8),
        np.array([[42]], dtype=np.uint8),
        np.arange(256, dtype=np.uint8).reshape(16, 16),
    ]
    for img in cases:
        out = decode_webp(encode_webp(img))
        assert np.array_equal(out, _rgba(img))


def test_prefix_code_value_roundtrip():
    for v in list(range(1, 400)) + [4096, 100000]:
        code, extra_val, extra_bits = _prefix_encode(v)
        bw = BitWriterLSB()
        bw.write_bits(extra_val, extra_bits)
        br = BitReaderLSB(bw.finish() or b"\x00")
        assert _prefix_value(code, br) == v, v


def test_distance_map_known_answer():
    """First 96 entries of the 120-neighbor map pinned as LITERALS against
    the spec's published listing (transcribed independently of the
    generator rule, so a generator ordering slip cannot self-confirm).
    The 97-120 tail follows the same (d², |dx|, dx<0) ordering rule but is
    not independently pinned — see COVERAGE.md (far-reference caveat)."""
    spec96 = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
        (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
        (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
        (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
        (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
        (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
        (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
        (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    ]
    assert DISTANCE_MAP[:96] == spec96
    assert len(DISTANCE_MAP) == 120
    # structural invariants of the tail: unique, in-window, monotone d²
    tail = DISTANCE_MAP[96:]
    assert len(set(DISTANCE_MAP)) == 120
    assert all(-8 <= dx <= 8 and 0 <= dy <= 8 and (dy > 0 or dx > 0) for dx, dy in tail)
    d2 = [dx * dx + dy * dy for dx, dy in DISTANCE_MAP]
    assert d2 == sorted(d2)


def test_decode_lz77_mid_table_plane_code():
    """Backref through a MID-TABLE plane code (> the r3 22-entry pin):
    code 35 maps to offset (0, 5) = distance 5*width on a 5-wide image —
    copies the pixel 5 rows up. Exercises the far-reference decode path
    our encoder never emits."""
    from robosat_spark.kernels.webp import DISTANCE_MAP

    assert DISTANCE_MAP[34] == (0, 5)  # plane code 35 (1-based)
    w, h = 5, 6
    bw = BitWriterLSB()
    _header(bw, w, h)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # greens: literal value per row (row index 0..5 -> green 100+row),
    # then one length-5 backref at the last row start… simpler: literals
    # for rows 0..4 (25 px), then a length-5 backref with plane code 35
    # copying row 0 into row 5
    from robosat_spark.kernels.webp import _prefix_encode

    lcode, lextra, lbits = _prefix_encode(5)  # length 5 -> code 4 + 1 extra bit
    lit_greens = {100 + r: w for r in range(5)}
    lit_greens[256 + lcode] = 1
    gt = _write_channel_code(bw, lit_greens, 280)
    rt = _write_channel_code(bw, {10: 1}, 256)
    bt = _write_channel_code(bw, {30: 1}, 256)
    at = _write_channel_code(bw, {255: 1}, 256)
    # distance: plane code 35 -> prefix code for value 35
    dcode, dextra, dbits = _prefix_encode(35)
    dt = _write_channel_code(bw, {dcode: 1}, 40)
    for r in range(5):
        for _ in range(w):
            c, l = gt[100 + r]; bw.write_code(c, l)
            c, l = rt[10]; bw.write_code(c, l)
            c, l = bt[30]; bw.write_code(c, l)
            c, l = at[255]; bw.write_code(c, l)
    c, l = gt[256 + lcode]; bw.write_code(c, l)  # length 5
    bw.write_bits(lextra, lbits)
    c, l = dt[dcode]; bw.write_code(c, l)
    bw.write_bits(dextra, dbits)
    out = decode_webp(_wrap(bw))
    assert out.shape == (h, w, 4)
    # row 5 == row 0 (copied through distance = 5 * width via code 35)
    assert np.array_equal(out[5], out[0])
    assert np.array_equal(out[0, :, 1], np.full(w, 100))


def _wrap(bw: BitWriterLSB) -> bytes:
    import struct

    vp8l = bytes([SIGNATURE]) + bw.finish()
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        riff += b"\x00"
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw, w, h):
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version


def test_decode_lz77_backref():
    """1x4: one literal then a length-3 distance-1 backref."""
    bw = BitWriterLSB()
    _header(bw, 4, 1)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # green tree: literal 20 + length-symbol 256+2 (length 3 -> code 2)
    gt = _write_channel_code(bw, {20: 5, 258: 1}, 280)
    rt = _write_channel_code(bw, {10: 1}, 256)
    bt = _write_channel_code(bw, {30: 1}, 256)
    at = _write_channel_code(bw, {255: 1}, 256)
    dt = _write_channel_code(bw, {13: 1}, 40)  # dist prefix sym for code 121
    c, l = gt[20]; bw.write_code(c, l)          # literal pixel
    for tab, s in ((rt, 10), (bt, 30), (at, 255)):
        c, l = tab[s]; bw.write_code(c, l)
    c, l = gt[258]; bw.write_code(c, l)         # length 3 (no extra bits)
    c, l = dt[13]; bw.write_code(c, l)          # dist prefix symbol
    bw.write_bits(24, 5)                        # extra -> dist_code 121 -> dist 1
    out = decode_webp(_wrap(bw))
    assert out.shape == (1, 4, 4)
    assert np.array_equal(out, np.tile([10, 20, 30, 255], (1, 4, 1)))


def test_decode_color_cache():
    """1x2: literal then a color-cache hit of the same pixel."""
    cache_bits = 4
    px = (255 << 24) | (10 << 16) | (20 << 8) | 30
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = BitWriterLSB()
    _header(bw, 2, 1)
    bw.write_bits(0, 1)              # no transforms
    bw.write_bits(1, 1)              # color cache
    bw.write_bits(cache_bits, 4)
    bw.write_bits(0, 1)              # no meta
    gt = _write_channel_code(bw, {20: 5, 280 + idx: 1}, 280 + (1 << cache_bits))
    rt = _write_channel_code(bw, {10: 1}, 256)
    bt = _write_channel_code(bw, {30: 1}, 256)
    at = _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    c, l = gt[20]; bw.write_code(c, l)
    c, l = gt[280 + idx]; bw.write_code(c, l)
    out = decode_webp(_wrap(bw))
    assert np.array_equal(out, np.tile([10, 20, 30, 255], (1, 2, 1)))


def test_decode_subtract_green_transform():
    """Residuals carry r-g / b-g; inverse adds green back."""
    r, g, b, a = 100, 30, 7, 255
    bw = BitWriterLSB()
    _header(bw, 1, 1)
    bw.write_bits(1, 1)  # a transform follows
    bw.write_bits(2, 2)  # subtract-green
    bw.write_bits(0, 1)  # end of transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    _write_channel_code(bw, {g: 1}, 280)
    _write_channel_code(bw, {(r - g) & 0xFF: 1}, 256)
    _write_channel_code(bw, {(b - g) & 0xFF: 1}, 256)
    _write_channel_code(bw, {a: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    out = decode_webp(_wrap(bw))  # all codes single-symbol: zero data bits
    assert np.array_equal(out, [[[r, g, b, a]]])


def test_decode_color_indexing_with_bundling():
    """2-color palette: 8 one-bit indices bundled into one green byte."""
    bw = BitWriterLSB()
    _header(bw, 8, 1)
    bw.write_bits(1, 1)  # a transform follows
    bw.write_bits(3, 2)  # color indexing
    bw.write_bits(1, 8)  # n_colors - 1 = 1
    # palette image (2x1, delta-coded): c0 = opaque black, c1 = c0 + red 255
    bw.write_bits(0, 1)  # sub-image: no color cache
    _write_channel_code(bw, {0: 1}, 280)            # greens both 0
    pr = _write_channel_code(bw, {0: 1, 255: 1}, 256)  # red: 0 then delta 255
    _write_channel_code(bw, {0: 1}, 256)            # blue
    pa = _write_channel_code(bw, {255: 1, 0: 1}, 256)  # alpha: 255 then delta 0
    _write_channel_code(bw, {0: 1}, 40)
    for red, alpha in ((0, 255), (255, 0)):
        c, l = pr[red]; bw.write_code(c, l)
        c, l = pa[alpha]; bw.write_code(c, l)
    bw.write_bits(0, 1)  # end of transforms
    # main image: packed width 1, single green 0b01010101
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    _write_channel_code(bw, {0b01010101: 1}, 280)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    out = decode_webp(_wrap(bw))
    red = [255, 0, 0, 255]
    black = [0, 0, 0, 255]
    assert np.array_equal(out, [[red, black, red, black, red, black, red, black]])


def test_decode_predictor_transform():
    """2x2, one block, mode 2 (T); edge rules L/T/black for the borders."""
    bw = BitWriterLSB()
    _header(bw, 2, 2)
    bw.write_bits(1, 1)  # a transform follows
    bw.write_bits(0, 2)  # predictor
    bw.write_bits(0, 3)  # size_bits - 2 = 0 -> 4x4 blocks -> 1x1 sub-image
    # sub-image: single pixel, green = mode 2
    bw.write_bits(0, 1)  # sub-image: no color cache
    _write_channel_code(bw, {2: 1}, 280)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    bw.write_bits(0, 1)  # end of transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # residuals: (0,0) vs opaque black -> (5,6,7,0); others zero
    gt = _write_channel_code(bw, {6: 1, 0: 3}, 280)
    rt = _write_channel_code(bw, {5: 1, 0: 3}, 256)
    bt = _write_channel_code(bw, {7: 1, 0: 3}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    for gg, rr, bb in ((6, 5, 7), (0, 0, 0), (0, 0, 0), (0, 0, 0)):
        c, l = gt[gg]; bw.write_code(c, l)
        c, l = rt[rr]; bw.write_code(c, l)
        c, l = bt[bb]; bw.write_code(c, l)
    out = decode_webp(_wrap(bw))
    assert np.array_equal(out, np.tile([5, 6, 7, 255], (2, 2, 1)))


def test_decode_predictor_tr_rightmost_column():
    """Mode 3 (TR) on the rightmost column: the spec's flat-array TR
    (pos - width + 1) wraps to the CURRENT row's leftmost pixel, not the
    previous row's (the r3 silent-corruption bug)."""
    bw = BitWriterLSB()
    _header(bw, 2, 2)
    bw.write_bits(1, 1)  # a transform follows
    bw.write_bits(0, 2)  # predictor
    bw.write_bits(0, 3)  # size_bits - 2 = 0 -> 4x4 blocks -> 1x1 sub-image
    bw.write_bits(0, 1)  # sub-image: no color cache
    _write_channel_code(bw, {3: 1}, 280)  # mode 3 = TR
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    bw.write_bits(0, 1)  # end of transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta
    # pixels: A=(10,20,30) B=(50,60,70) C=(1,2,3) D=C (zero residual vs TR)
    # edge rules: A vs black, B vs L=A, C vs out[y-1,0]=A; D vs TR which
    # MUST be C (current row leftmost) — the old bug predicted from A
    g_res = [(20, 10, 30), ((60 - 20) & 0xFF, (50 - 10) & 0xFF, (70 - 30) & 0xFF),
             ((2 - 20) & 0xFF, (1 - 10) & 0xFF, (3 - 30) & 0xFF), (0, 0, 0)]
    gt = _write_channel_code(bw, {v[0]: 1 for v in g_res}, 280)
    rt = _write_channel_code(bw, {v[1]: 1 for v in g_res}, 256)
    bt = _write_channel_code(bw, {v[2]: 1 for v in g_res}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    for gg, rr, bb in g_res:
        c, l = gt[gg]; bw.write_code(c, l)
        c, l = rt[rr]; bw.write_code(c, l)
        c, l = bt[bb]; bw.write_code(c, l)
    out = decode_webp(_wrap(bw))
    assert np.array_equal(out[0, 0], [10, 20, 30, 255])
    assert np.array_equal(out[0, 1], [50, 60, 70, 255])
    assert np.array_equal(out[1, 0], [1, 2, 3, 255])
    assert np.array_equal(out[1, 1], [1, 2, 3, 255])  # == C, not A


def test_decode_predictor_mode13_truncates_toward_zero():
    """ClampAddSubtractHalf: (a - TL) / 2 is C truncation toward zero —
    a=100, TL=105 gives 100 + trunc(-5/2) = 98, not floor's 97."""
    bw = BitWriterLSB()
    _header(bw, 2, 2)
    bw.write_bits(1, 1)
    bw.write_bits(0, 2)  # predictor
    bw.write_bits(0, 3)
    bw.write_bits(0, 1)
    _write_channel_code(bw, {13: 1}, 280)  # mode 13
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    # (0,0)=105 vs black; (0,1)=100 vs L; (1,0)=100 vs out[0,0]; (1,1)
    # residual 0 vs mode-13 pred: a=avg2(100,100)=100, TL=105 -> 98
    res = [105, 251, 251, 0]  # same residual per r/g/b channel
    gt = _write_channel_code(bw, {105: 1, 251: 2, 0: 1}, 280)
    rt = _write_channel_code(bw, {105: 1, 251: 2, 0: 1}, 256)
    bt = _write_channel_code(bw, {105: 1, 251: 2, 0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    for v in res:
        for tab in (gt, rt, bt):
            c, l = tab[v]; bw.write_code(c, l)
    out = decode_webp(_wrap(bw))
    assert np.array_equal(out[1, 1], [98, 98, 98, 255])


def test_decode_vp8x_with_lossless_payload():
    """VP8X (extended header, how libwebp writes lossless+metadata files)
    must not be rejected: scan on and decode the VP8L chunk."""
    import struct

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    plain = encode_webp(img)
    vp8l_size = struct.unpack("<I", plain[16:20])[0]
    vp8l_chunk = plain[12 : 20 + vp8l_size + (vp8l_size & 1)]
    vp8x_body = bytes([0x00, 0, 0, 0]) + b"\x05\x00\x00" + b"\x03\x00\x00"  # 6x4
    content = b"WEBP" + b"VP8X" + struct.pack("<I", len(vp8x_body)) + vp8x_body + vp8l_chunk
    payload = b"RIFF" + struct.pack("<I", len(content)) + content
    assert np.array_equal(decode_webp(payload), _rgba(img))


def test_decode_rejects_garbage_and_lossy():
    with pytest.raises(ValueError):
        decode_webp(b"nonsense")
    import struct

    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)


def test_decode_images_webp_spark(spark):
    """decode_images routes RIFF/WEBP payloads through the VP8L decoder."""
    from robosat_spark.functions.multimodal import decode_images

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (6, 5, 3), dtype=np.uint8)
    payload = encode_webp(img)
    df = spark.createDataFrame([("w1", bytearray(payload))], "url STRING, data BINARY")
    rows = decode_images(df, key_col="url", data_col="data", fake=False).collect()
    assert len(rows) == 1
    r = rows[0]
    got = np.frombuffer(bytes(r["pixels"]), np.uint8).reshape(r["h"], r["w"], r["channels"])
    assert np.array_equal(got, _rgba(img))
