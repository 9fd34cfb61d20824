"""Pure-python baseline JPEG codec — REAL pixel decode, no image library.

Closes the last partial in SURVEY.md §2 M16: the reference PIL-opens
base64 data-URI photos (reference: ui/streamlit_ui.py:14-25), and this
environment has no PIL — so the engine carries its own decoder for the
format those photos actually use (baseline sequential DCT, SOF0: by far
the dominant JPEG flavor on the web).

``jpeg_decode``: SOI → DQT/DHT/SOF0/DRI/SOS marker walk, entropy decode
(Huffman + byte-unstuffing + restart markers), dequantize, inverse
zigzag, float IDCT per 8×8 block, chroma upsampling (replication),
JFIF YCbCr→RGB. Supports 8-bit baseline, 1- or 3-component, any
sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0). Returns
``(width, height, channels, ndarray[h, w, c])`` or None for payloads it
cannot decode (progressive SOF2, arithmetic coding, 12-bit) — callers
fall back to the header-parse tier, never crash.

``jpeg_encode_baseline``: the matching encoder (4:4:4, Annex K standard
Huffman + quality-scaled quant tables). It exists so decode correctness
is provable WITHOUT PIL: solid-color images quantize exactly (DC-only
blocks), so encode→decode must round-trip bit-exact, and smooth
gradients must round-trip within a small tolerance — pinned in
tests/test_report_media.py.

Perf note: this is an actor-pool `map_batches` stage's inner codec for
multi-KB thumbnails, not a bulk-throughput path — the Huffman bit loop
is Python. A cluster with real decoders installed flips to the PIL tier
in ``ImageDecodeStub.__init__`` without touching pipeline code.
"""

from __future__ import annotations

import functools
import struct

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)
_ZZ_LIST = ZIGZAG.tolist()  # python-int index list for the decode loop

# Annex K.1 luminance / chrominance quantization tables (natural order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8-point DCT-II orthonormal basis (float64): IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * \
            (np.sqrt(0.125) if _u == 0 else 0.5)
del _u, _x


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# decode work/memory cap (shared policy with stages/gif.py): SOF0 can
# declare 65535×65535 (~13 GB of float planes) — reject before any
# allocation. 16 Mpx (≈ 4900×3400 — covers modern camera photos, which
# r4 decoded and r5 must keep decoding) bounds the transients at
# ~260 MB per decode: int32 coef store (baseline dequant coefficients
# are ≤ 255·11-bit magnitudes, well inside int32) 64 MB + float64 IDCT
# output 128 MB + plane, per component sequentially — vs the ~1.6 GB
# the r4 cap of 2^26 permitted (cap sized from the actual allocations,
# per the r4 advice).
MAX_PIXELS = 1 << 24


# -------------------------------------------------------------- huffman

def _build_decode_table(bits, huffval):
    """(length, code) -> symbol map per JPEG Annex C code assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits, huffval):
    dec = _build_decode_table(bits, huffval)
    return {sym: (ln, code) for (ln, code), sym in dec.items()}


@functools.lru_cache(maxsize=32)
def _peek_lut_cached(key):
    """16-bit lookahead Huffman LUT (r5 hot-loop fix): next-16-bits →
    ``(symbol << 8) | code_length`` (0 = invalid prefix), as a stdlib
    ``array('i')`` — C-backed indexing returns python ints at list
    speed but costs 256 KB per table instead of the ~2.5 MB a
    list-of-PyLongs would pin per cache slot (the cache is keyed by
    table CONTENT, so crafted payloads with distinct DHTs bound at
    32 × 256 KB = 8 MB per process, not ~80 MB; r5 review fix). One
    peek + one index decodes a whole symbol — the r4 path walked the
    (length, code) dict one ``read_bit`` at a time. The Annex K tables
    repeat across every image a batch decodes, so the 64 K-slot build
    is paid once per distinct table per process."""
    from array import array

    bits, huffval = key
    dec = _build_decode_table(list(bits), list(huffval))
    lut = np.zeros(1 << 16, dtype=np.int32)
    for (length, code), sym in dec.items():
        lo = code << (16 - length)
        lut[lo:lo + (1 << (16 - length))] = (sym << 8) | length
    return array("i", lut.tolist())


@functools.lru_cache(maxsize=32)
def _encode_table_cached(key):
    bits, huffval = key
    return _build_encode_table(list(bits), list(huffval))


def _split_entropy_segments(payload: bytes, pos: int) -> list[bytes]:
    """Entropy-coded bytes from ``pos`` to the next real marker, split
    at RSTn boundaries and 0xFF00-unstuffed per segment with
    ``bytes.replace`` (C speed — the r4 reader unstuffed one python
    byte at a time inside the bit loop)."""
    d = payload
    n = len(d)
    segs = []
    start = i = pos
    while True:
        j = d.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(d[start:n])
            break
        nxt = d[j + 1]
        if nxt == 0x00:
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
            segs.append(d[start:j])
            start = i = j + 2
        else:  # EOI or another marker: scan over
            segs.append(d[start:j])
            break
    return [s.replace(b"\xff\x00", b"\xff") for s in segs]


class _SegBits:
    """MSB-first bit reader over ONE unstuffed entropy segment with a
    16-bit peek for table-driven Huffman lookahead. Peeks past the end
    zero-pad; CONSUMING past the end raises (truncated stream → decode
    fails → header-parse tier, same contract as the r4 per-byte
    reader)."""

    __slots__ = ("data", "n", "pos", "acc", "bits", "used", "total")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0
        self.total = 8 * self.n
        self.used = 0

    def peek16(self) -> int:
        acc, bits, pos = self.acc, self.bits, self.pos
        if bits < 16:
            d, n = self.data, self.n
            while bits < 16:
                acc = (acc << 8) | (d[pos] if pos < n else 0)
                pos += 1
                bits += 8
            self.acc, self.bits, self.pos = acc, bits, pos
        return (acc >> (bits - 16)) & 0xFFFF

    def consume(self, k: int):
        self.used += k
        if self.used > self.total:
            raise EOFError
        self.bits -= k
        self.acc &= (1 << self.bits) - 1

    def receive(self, t: int) -> int:
        """Read a t-bit magnitude (t ≤ 16)."""
        v = self.peek16() >> (16 - t)
        self.consume(t)
        return v


def _extend(v: int, t: int) -> int:
    """JPEG F.2.2.1 sign extension of a t-bit magnitude."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------- decode

def jpeg_decode(payload: bytes):
    """Baseline-JPEG pixel decode. Returns (w, h, channels, uint8
    ndarray[h, w, channels]) or None when the payload isn't a baseline
    JPEG this decoder covers."""
    try:
        return _jpeg_decode_inner(payload)
    except Exception:
        return None


def _jpeg_decode_inner(payload: bytes):
    n = len(payload)
    if n < 4 or payload[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) comps: [(cid, hs, vs, tq)]
    i = 2
    while i + 4 <= n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = int.from_bytes(payload[i + 2:i + 4], "big")
        body = payload[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(body[p:p + 64], np.uint8) \
                        .astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(body[p:p + 128], ">u2") \
                        .astype(np.int64)
                    p += 128
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = tbl
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = tuple(body[p + 1:p + 17])
                cnt = sum(bits)
                huffval = tuple(body[p + 17:p + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _peek_lut_cached((bits, huffval))
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if w * h > MAX_PIXELS:
                return None
            nc = body[5]
            comps = []
            for c in range(nc):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                tq = body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w, h, comps)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            nc = body[0]
            scan = []
            for c in range(nc):
                cs = body[1 + 2 * c]
                tdta = body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0xF))
            data_start = i + 2 + seg_len
            return _decode_scan(payload, data_start, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + seg_len
    return None


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    w, h, comps = frame
    if not (1 <= len(comps) <= 3) or len(scan) != len(comps):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2 or hmax < 1 or vmax < 1:
        return None
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    scan_by_cid = {s[0]: s for s in scan}
    # per-component coefficient store (natural order): the entropy loop
    # only scatters ints here; dequant + IDCT run BATCHED per component
    # afterwards (r5 — one broadcasted matmul chain instead of a
    # np.zeros + 8×8 IDCT + slice-assign per block)
    # int32: baseline entropy-decoded coefficients are ≤ 11-bit
    # magnitudes (dequantization multiplies AFTER, in the int64
    # broadcast below), and halving the store is what lets MAX_PIXELS
    # sit at 2^24 within the same transient budget
    coefs = []
    for cid, hs, vs, tq in comps:
        coefs.append(np.zeros((mcus_y * vs, mcus_x * hs, 64),
                              dtype=np.int32))

    segs = _split_entropy_segments(payload, pos)
    br = _SegBits(segs[0])
    seg_i = 0
    zz = _ZZ_LIST
    pred = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                # restart: next pre-split segment, byte-aligned by
                # construction; DC predictors reset
                seg_i += 1
                if seg_i >= len(segs):
                    raise EOFError
                br = _SegBits(segs[seg_i])
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                _, td, ta = scan_by_cid[cid]
                dlut = huff_dc[td]
                alut = huff_ac[ta]
                cstore = coefs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        row = cstore[my * vs + by, mx * hs + bx]
                        e = dlut[br.peek16()]
                        if e == 0:
                            raise ValueError("bad huffman code")
                        br.consume(e & 0xFF)
                        t = e >> 8
                        pred[ci] += _extend(br.receive(t), t)
                        row[0] = pred[ci]  # ZIGZAG[0] == 0
                        k = 1
                        while k < 64:
                            e = alut[br.peek16()]
                            if e == 0:
                                raise ValueError("bad huffman code")
                            br.consume(e & 0xFF)
                            rs = e >> 8
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overflow")
                            row[zz[k]] = _extend(br.receive(s), s)
                            k += 1
            mcu_index += 1

    # batched dequant + IDCT + de-block per component
    planes = []
    for (cid, hs, vs, tq), cstore in zip(comps, coefs):
        nby, nbx = cstore.shape[0], cstore.shape[1]
        px = _idct2(cstore.reshape(nby, nbx, 8, 8) * qt[tq]) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))

    # upsample to full resolution (replication), crop, color-convert
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        if hs != hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs != vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return (w, h, 1, gray[:, :, None])
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return (w, h, 3, np.clip(np.rint(rgb), 0, 255).astype(np.uint8))


# --------------------------------------------------------------- encode

def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (tbl * s + 50) // 100
    return np.clip(out, 1, 255)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int, dc_tbl, ac_tbl) -> int:
    zz = np.rint(_dct2(block.astype(np.float64) - 128.0) / q) \
        .astype(np.int64).reshape(-1)[ZIGZAG].tolist()
    return _encode_block_bits(bw, zz, pred, dc_tbl, ac_tbl)


def _encode_block_bits(bw: _BitWriter, zz: list, pred: int,
                       dc_tbl, ac_tbl) -> int:
    """Entropy-code one already-DCT'd/quantized/zigzagged block (a
    python int list — the encoder batches the numpy chain per
    component, r5). The AC loop's gap arithmetic replaces the r4
    63-step run counter; pure-list reads replace numpy scalar
    iteration (the old encode hot spot)."""
    dc = zz[0]
    diff = dc - pred
    t = abs(diff).bit_length()
    ln, code = dc_tbl[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    last_nz = 0
    prev_k = 0
    for k in range(1, 64):
        v = zz[k]
        if v == 0:
            continue
        run = k - prev_k - 1
        while run > 15:
            ln, code = ac_tbl[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        ln, code = ac_tbl[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        prev_k = last_nz = k
    if last_nz < 63:
        ln, code = ac_tbl[0x00]  # EOB
        bw.write(code, ln)
    return dc


def jpeg_encode_baseline(arr: np.ndarray, quality: int = 90,
                         subsample: bool = False,
                         restart_interval: int = 0) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array (or (h, w)/(h, w, 1)
    grayscale) as a baseline JFIF JPEG with Annex K Huffman tables —
    4:4:4 by default, 4:2:0 with ``subsample=True`` (2×2 chroma
    averaging), optional DRI restart markers. Exists to prove the
    decoder's subsampling/restart paths without PIL; also powers JPEG
    thumbnail re-encode in ImageResizeStub."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    assert ch in (1, 3)
    gray = ch == 1
    if gray:
        subsample = False
    qy = _quality_scale(_QT_LUMA, quality)
    qc = _quality_scale(_QT_CHROMA, quality)
    qy_nat = np.zeros((8, 8), dtype=np.int64)
    qy_nat.reshape(-1)[:] = qy
    qc_nat = np.zeros((8, 8), dtype=np.int64)
    qc_nat.reshape(-1)[:] = qc
    # tables arrive in natural order here; emit zigzag order in DQT
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def dqt(tid, nat):
        zz = nat.reshape(-1)[ZIGZAG]
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + \
            bytes(int(x) for x in zz)

    out += dqt(0, qy_nat)
    if not gray:
        out += dqt(1, qc_nat)
    nc = 1 if gray else 3
    luma_hv = 0x22 if subsample else 0x11
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    if gray:
        out += bytes([1, 0x11, 0])
    else:
        out += bytes([1, luma_hv, 0, 2, 0x11, 1, 3, 0x11, 1])
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def dht(tc, th, spec):
        bits, vals = spec
        return b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) + \
            bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    if gray:
        out += bytes([1, 0x00])
    else:
        out += bytes([1, 0x00, 2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])

    f = arr.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
        qts = [qy_nat]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        qts = [qy_nat, qc_nat, qc_nat]
    def _pad(p, mult):
        ph_, pw_ = ((p.shape[0] + mult - 1) // mult * mult,
                    (p.shape[1] + mult - 1) // mult * mult)
        pp = np.empty((ph_, pw_))
        pp[:p.shape[0], :p.shape[1]] = p
        pp[p.shape[0]:, :p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1:p.shape[1]]
        return pp

    if subsample:
        # 2×2 mean-downsample chroma (pad odd dims by edge first)
        y = _pad(planes[0], 16)
        cbcr = []
        for p in planes[1:]:
            p2 = _pad(p, 2)
            d = (p2[0::2, 0::2] + p2[1::2, 0::2]
                 + p2[0::2, 1::2] + p2[1::2, 1::2]) / 4.0
            cbcr.append(_pad(d, 8))
        padded = [y] + cbcr
        # samples-per-MCU: luma 2×2 blocks, chroma 1×1
        mcus_x, mcus_y = y.shape[1] // 16, y.shape[0] // 16
        blocks_of = [[(0, 0), (0, 1), (1, 0), (1, 1)], [(0, 0)], [(0, 0)]]
        base = [16, 8, 8]
    else:
        padded = [_pad(p, 8) for p in planes]
        mcus_x = padded[0].shape[1] // 8
        mcus_y = padded[0].shape[0] // 8
        blocks_of = [[(0, 0)]] * nc
        base = [8] * nc
    def _etbl(spec):  # cached: tables are per-process, not per-image
        return _encode_table_cached((tuple(spec[0]), tuple(spec[1])))

    dc_tbls = [_etbl(_DC_LUMA)] + \
        ([] if gray else [_etbl(_DC_CHROMA)] * 2)
    ac_tbls = [_etbl(_AC_LUMA)] + \
        ([] if gray else [_etbl(_AC_CHROMA)] * 2)
    # batched DCT → quantize → zigzag per component (r5): one
    # broadcasted matmul chain + one tolist() replaces six numpy ops
    # per block; the MCU loop below only does bit output
    zz_of = []
    for ci in range(nc):
        p = padded[ci]
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        d = _dct2(blocks - 128.0)
        zz_of.append(np.rint(d / qts[ci]).astype(np.int64)
                     .reshape(nby, nbx, 64)[:, :, ZIGZAG].tolist())
    bw = _BitWriter()
    pred = [0] * nc
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            for ci in range(nc):
                bb = base[ci] // 8
                for by, bx in blocks_of[ci]:
                    zz = zz_of[ci][my * bb + by][mx * bb + bx]
                    pred[ci] = _encode_block_bits(
                        bw, zz, pred[ci], dc_tbls[ci], ac_tbls[ci])
            mcu_index += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
