"""Baseline JPEG (ITU-T T.81) codec — from-scratch stdlib+NumPy.

Un-stubs the second multimodal format (functions.multimodal.decode_images):
the container ships no PIL/cv2/libjpeg, so both directions are implemented
directly from the public spec:

- ``decode_jpeg``: marker walk (DQT/DHT/SOF0/SOS/DRI), Huffman entropy
  decode with byte-unstuffing and restart markers, DC prediction, zigzag +
  dequantize, exact float IDCT (matrix form), chroma upsample (replicate),
  YCbCr->RGB (ITU-R BT.601, the JFIF convention).
- ``encode_jpeg``: the inverse chain (grayscale or 4:4:4 color, standard
  Annex-K quantization tables scaled by ``quality``, fixed Annex-K Huffman
  tables).

Only sequential baseline (SOF0) is supported; progressive/arithmetic raise
ValueError. Pure NumPy — no Spark imports (kernel layer contract).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the scan -> (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto standard)
_STD_LUMA_Q = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
_STD_CHROMA_Q = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16] counts, values)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _idct_matrix() -> np.ndarray:
    """8x8 DCT-III basis: M[x, u] = C(u)/2 * cos((2x+1)u*pi/16)."""
    x = np.arange(8, dtype=np.float64)
    u = np.arange(8, dtype=np.float64)
    m = 0.5 * np.cos((2.0 * x[:, None] + 1.0) * u[None, :] * np.pi / 16.0)
    m[:, 0] *= 1.0 / np.sqrt(2.0)
    return m


_IDCT_M = _idct_matrix()


def idct2(block: np.ndarray) -> np.ndarray:
    """Exact separable 2-D inverse DCT of one 8x8 coefficient block."""
    return _IDCT_M @ block @ _IDCT_M.T


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward 2-D DCT (the transpose pair of :func:`idct2`)."""
    return _IDCT_M.T @ block @ _IDCT_M


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError("truncated JPEG entropy stream (marker hit)")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.bitbuf = 0

    def skip_restart(self) -> None:
        """Consume an expected RSTn marker at the current byte position."""
        self.byte_align()
        if self.data[self.pos] != 0xFF or not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("missing restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("malformed JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array (h, w) grayscale or (h, w, 3) RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("malformed JPEG: missing SOI")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    n = len(payload)

    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("malformed JPEG: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                else:
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = q
                qtables[tid] = tab.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _build_huffman(bits, values)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, sampling, qid = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": sampling >> 4, "v": sampling & 0x0F, "q": qid}
                )
            frame = {"h": height, "w": width, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy-coded data follows
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF0")
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tsel = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cid] = (tsel >> 4, tsel & 0x0F)
            pos += seglen
            return _decode_scan(
                payload, pos, frame, scan_tabs, qtables, htables, restart_interval
            )
        pos += seglen
    raise ValueError("malformed JPEG: no SOS marker")


def _decode_scan(data, pos, frame, scan_tabs, qtables, htables, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))

    reader = _BitReader(data, pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.skip_restart()
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan_tabs[c["id"]]
                dc_tab = htables[(0, dct)]
                ac_tab = htables[(1, act)]
                q = qtables[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.read_bits(t), t)
                        dc_pred[ci] += diff
                        coeffs[0] = dc_pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("malformed JPEG: AC overrun")
                            coeffs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.int64)
                        block[_ZIGZAG] = coeffs
                        block = block.reshape(8, 8) * q
                        px = idct2(block.astype(np.float64)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    h, w = frame["h"], frame["w"]
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])

    if len(comps) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (grayscale or 4:4:4 color, fixed Annex-K tables)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits per spec


def _encode_table(bits, values):
    """symbol -> (code, length) from a (bits, values) spec."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code)."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v >= 0:
        return t, v
    return t, v + (1 << t) - 1


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JPEG bytes
    (4:4:4, standard tables). The test harness round-trips this against
    :func:`decode_jpeg`; it is also the honest local substitute for a
    libjpeg writer in the multimodal sink."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _scaled_q(_STD_LUMA_Q, quality)
    qc = _scaled_q(_STD_CHROMA_Q, quality)

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        qs = [ql]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qs = [ql, qc, qc]

    dc_specs = [_STD_DC_LUMA] + ([_STD_DC_CHROMA] * 2 if not gray else [])
    ac_specs = [_STD_AC_LUMA] + ([_STD_AC_CHROMA] * 2 if not gray else [])
    dc_enc = [_encode_table(*s) for s in dc_specs]
    ac_enc = [_encode_table(*s) for s in ac_specs]

    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = []
    for p in planes:
        pp = np.empty((bh, bw), dtype=np.float64)
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    writer = _BitWriter()
    dc_pred = [0] * len(planes)
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for ci, p in enumerate(padded):
                block = fdct2(p[by : by + 8, bx : bx + 8])
                qcoef = np.round(block / qs[ci]).astype(np.int64)
                zz = qcoef.reshape(-1)[_ZIGZAG]
                diff = int(zz[0]) - dc_pred[ci]
                dc_pred[ci] = int(zz[0])
                t, code = _magnitude(diff)
                hcode, hlen = dc_enc[ci][t]
                writer.write(hcode, hlen)
                if t:
                    writer.write(code, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        if k > last_nz:
                            hcode, hlen = ac_enc[ci][0x00]  # EOB
                            writer.write(hcode, hlen)
                            break
                        run += 1
                        if run == 16:
                            hcode, hlen = ac_enc[ci][0xF0]  # ZRL
                            writer.write(hcode, hlen)
                            run = 0
                        continue
                    t, code = _magnitude(v)
                    hcode, hlen = ac_enc[ci][(run << 4) | t]
                    writer.write(hcode, hlen)
                    writer.write(code, t)
                    run = 0
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    for tid, q in enumerate(qs[:2] if not gray else qs[:1]):
        zzq = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        seg(0xDB, bytes([tid]) + zzq.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    seg(0xC0, sof)
    for tc, specs in ((0, dc_specs), (1, ac_specs)):
        for tid, (bits, values) in enumerate(specs[:2] if not gray else specs[:1]):
            seg(0xC4, bytes([(tc << 4) | tid] + bits + values))
    sos = bytes([ncomp])
    for c in range(ncomp):
        tid = 0 if c == 0 else 1
        sos += bytes([c + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(writer.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
