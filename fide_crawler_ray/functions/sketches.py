"""Mergeable sketches for near-duplicate detection: MinHash (+LSH
banding), SimHash, and exact n-gram Jaccard verification.

All deterministic (fixed seeds / keyed hashes) so results are stable
across processes and cluster sizes. Hot paths are numpy-vectorized per
document; documents are processed in Arrow batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD = re.compile(r"\w+")
_MERSENNE = (1 << 61) - 1


def tokenize(text: str) -> list[str]:
    return [w.lower() for w in _WORD.findall(text or "")]


def shingles(text: str, k: int = 3) -> list[str]:
    """Word k-shingles; a doc shorter than k words yields one shingle."""
    toks = tokenize(text)
    if len(toks) <= k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def char_shingles(text: str, n: int = 5) -> list[str]:
    """Lowercased character n-grams (the shingle family behind the
    n-gram-Jaccard dedup flavor); a doc shorter than n chars yields one
    shingle."""
    t = (text or "").lower()
    if not t:
        return []
    if len(t) <= n:
        return [t]
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def _hash64(strings: list[str]) -> np.ndarray:
    """Deterministic 64-bit hashes, vectorized (pandas siphash with a
    fixed key — C speed; a per-string hashlib loop was the minhash
    stage's hot spot)."""
    if not strings:
        return np.empty(0, dtype=np.uint64)
    import pandas as pd

    arr = np.array(strings, dtype=object)
    return pd.util.hash_array(arr, hash_key="fcray-shingles16").astype(np.uint64)


def md5_hash64(strings) -> np.ndarray:
    """Deterministic md5-derived 64-bit hashes (first 16 hex chars of
    md5). Slower than the siphash path but exactly replayable in a
    DuckDB oracle as ``('0x'||substr(md5(s),1,16))::UBIGINT`` — used
    where the downstream result must be SQL-verifiable end to end
    (simhash token hashes, rolling fingerprints)."""
    return np.array(
        [int(hashlib.md5(s.encode()).hexdigest()[:16], 16) for s in strings],
        dtype=np.uint64,
    )


class MinHasher:
    """n_perm universal-hash permutations h_i(x) = (a_i·x + b_i) mod p."""

    def __init__(self, n_perm: int = 128, seed: int = 1234):
        rng = np.random.default_rng(seed)
        self.n_perm = n_perm
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        """(m,) shingle hashes → (n_perm,) uint64 signature. Uses uint64
        wraparound arithmetic (a·x + b mod 2^64) — a fast, fully
        vectorized hash family with the same exchangeability properties
        in practice as mod-p universal hashing."""
        if len(shingle_hashes) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingle_hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            vals = self.a[:, None] * x[None, :] + self.b[:, None]
        return vals.min(axis=1)

    def signatures(self, texts: list[str], k: int = 3,
                   shingler=shingles) -> np.ndarray:
        """Batch signatures: ONE hash call for every shingle in the
        batch, then a per-permutation streaming pass — multiply/add into
        a reused (total_shingles,) buffer + segment-min via
        ``minimum.reduceat``. Same arithmetic as the one-shot
        (n_perm × total_shingles) matrix (bit-identical signatures), but
        never allocates it: at 5k docs × ~450 shingles that matrix is
        2.3 GB and its allocation+traffic dominated the whole minhash
        pipeline (22 s → ~1 s for the signature stage)."""
        shingle_lists = [shingler(t, k) for t in texts]
        sigs = np.full((len(texts), self.n_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        if len(nonempty) == 0:
            return sigs
        X = _hash64([sh for s in shingle_lists for sh in s])
        ne_lens = lens[nonempty]
        starts = np.zeros(len(nonempty), dtype=np.int64)
        starts[1:] = np.cumsum(ne_lens)[:-1]
        V = np.empty_like(X)
        with np.errstate(over="ignore"):
            for p in range(self.n_perm):
                np.multiply(X, self.a[p], out=V)
                V += self.b[p]
                sigs[nonempty, p] = np.minimum.reduceat(V, starts)
        return sigs


def band_keys(sig: np.ndarray, n_bands: int) -> list[bytes]:
    """Split a signature into n_bands bands; each band hashes to a bucket
    key. Candidate pairs share ≥1 (band_id, key)."""
    r = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        h = hashlib.blake2b(sig[b * r : (b + 1) * r].tobytes(), digest_size=8)
        keys.append(bytes([b]) + h.digest())
    return keys


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-shingle Jaccard (candidate verification)."""
    sa, sb = set(shingles(text_a, k)), set(shingles(text_b, k))
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard(text_a: str, text_b: str, n: int = 5) -> float:
    """Character n-gram Jaccard similarity."""
    a = (text_a or "").lower()
    b = (text_b or "").lower()
    sa = {a[i : i + n] for i in range(max(1, len(a) - n + 1))}
    sb = {b[i : i + n] for i in range(max(1, len(b) - n + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens weighted by term frequency.

    Token hashes are md5-derived (``md5_hash64``) so the whole simhash —
    and therefore the hamming-graph survivor set of ``simhash_dedup`` —
    is exactly replayable in the DuckDB oracle (queries.py
    ``dedup_simhash``)."""
    toks = tokenize(text)
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    hs = md5_hash64(list(uniq))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")


def simhash_band_keys(h: int, n_bands: int = 4) -> list[bytes]:
    """Split the 64-bit simhash into n_bands equal bit-bands → bucket keys
    (two docs within hamming distance < n_bands share ≥1 band exactly)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return [
        bytes([b]) + ((int(h) >> (b * width)) & mask).to_bytes(8, "big")
        for b in range(n_bands)
    ]


class UnionFind:
    """Driver-side union-find for clustering the (sparse) verified
    candidate-pair output. Scale note: pairs are the tiny tail of LSH —
    corpus-size state never lands on the driver; only edges do."""

    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def groups(self) -> dict:
        return {x: self.find(x) for x in list(self.parent)}


# ============================================================ HyperLogLog

HLL_P = 14  # 2^14 = 16384 registers, ~0.81% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit avalanche hash (splitmix64 finalizer),
    vectorized — uniform bits for HLL from integer keys."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hll_partial(keys: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """One batch's HLL register array (uint8[2^p]); merge = elementwise
    max — fully mergeable, so distinct-count scales with zero shuffle."""
    h = _splitmix64(keys)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # low 64-p bits shifted to the top
    # rank = leading zeros of `rest` within 64-p bits, +1; rest==0 → max
    nz = rest != 0
    lz = np.full(len(h), 64 - p, dtype=np.uint8)
    if nz.any():
        # floor(log2(rest)) via float64 exponent is exact for the top bit
        top = np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
        lz[nz] = (63 - top).astype(np.uint8)
    rank = lz + 1
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> float:
    """Standard HLL estimator with small-range (linear counting)
    correction — the published Flajolet et al. formulation."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


# ================================================== histogram quantiles

HIST_BINS = 8192


def hist_partial(vals: np.ndarray, lo: float, hi: float,
                 bins: int = HIST_BINS) -> np.ndarray:
    """One batch's fixed-range histogram counts (int64[bins]); merge =
    elementwise sum — mergeable, so continuous-column quantiles need no
    sort and no distinct-value exchange (the exact-CDF plan is for small
    discrete domains). Values outside [lo, hi] clamp to the edge bins."""
    if hi <= lo:
        counts = np.zeros(bins, dtype=np.int64)
        counts[0] = len(vals)
        return counts
    idx = ((vals - lo) * (bins / (hi - lo))).astype(np.int64)
    np.clip(idx, 0, bins - 1, out=idx)
    return np.bincount(idx, minlength=bins).astype(np.int64)


def hist_quantile(counts: np.ndarray, lo: float, hi: float,
                  q: float) -> float:
    """Quantile from merged histogram counts: rank ceil(q·n) located in
    the bin CDF, answered with the bin's RIGHT edge — guaranteed within
    one bin width, (hi-lo)/bins, above the true value."""
    import math

    cum = np.cumsum(counts)
    n = int(cum[-1])
    if n == 0:
        return lo
    r = max(1, math.ceil(q * n))
    b = int(np.searchsorted(cum, r))
    return lo + (b + 1) * (hi - lo) / len(counts)


# --------------------------------------------------------- count-min

CMS_W = 16384  # width → overcount ≤ e/W · N with prob 1 − e^−D per query
CMS_D = 4      # depth (independent rows)


def cms_partial(keys: np.ndarray, w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """One batch's count-min sketch: a d×w int64 matrix where row i
    bucket-counts ``splitmix64(key ^ seed_i) mod w``. Partials merge by
    elementwise SUM (fully mergeable, like the HLL register max)."""
    m = np.zeros((d, w), dtype=np.int64)
    k = keys.astype(np.uint64)
    for i in range(d):
        h = _splitmix64(k ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF))
        np.add.at(m[i], (h % np.uint64(w)).astype(np.int64), 1)
    return m.reshape(-1)


def cms_query(m: np.ndarray, keys: np.ndarray,
              w: int = CMS_W, d: int = CMS_D) -> np.ndarray:
    """Point estimates: min over the d rows (never underestimates)."""
    mm = m.reshape(d, w)
    k = keys.astype(np.uint64)
    est = np.full(len(k), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        h = _splitmix64(k ^ np.uint64((0x9E3779B97F4A7C15 * (i + 1)) & 0xFFFFFFFFFFFFFFFF))
        np.minimum(est, mm[i][(h % np.uint64(w)).astype(np.int64)], out=est)
    return est


# ------------------------------------------------------------- bloom

BLOOM_K = 6  # double-hashed probes per key (Kirsch–Mitzenmacher)


def _bloom_idx(keys: np.ndarray, m_bits: int, k: int):
    """Yield the k probe bit-indices per key: (h1 + i·h2) mod m with two
    independent splitmix64 streams — deterministic, vectorized."""
    kk = keys.astype(np.uint64)
    h1 = _splitmix64(kk)
    h2 = _splitmix64(kk ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    m = np.uint64(m_bits)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % m).astype(np.int64)


def bloom_partial(keys: np.ndarray, m_bits: int,
                  k: int = BLOOM_K) -> np.ndarray:
    """One batch's Bloom filter as a uint64 word array (m_bits/64
    words). Partials merge by elementwise OR — fully mergeable, so the
    build never shuffles; only filter buffers move."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    for idx in _bloom_idx(keys, m_bits, k):
        np.bitwise_or.at(words, idx >> 6,
                         np.uint64(1) << (idx.astype(np.uint64)
                                          & np.uint64(63)))
    return words


def bloom_probe(words: np.ndarray, keys: np.ndarray,
                k: int = BLOOM_K) -> np.ndarray:
    """Membership mask: True iff every probe bit is set (no false
    negatives by construction; false positives bounded by m/n and k)."""
    m_bits = len(words) * 64
    ok = np.ones(len(keys), dtype=bool)
    for idx in _bloom_idx(keys, m_bits, k):
        bit = (words[idx >> 6] >> (idx.astype(np.uint64)
                                   & np.uint64(63))) & np.uint64(1)
        ok &= bit.astype(bool)
    return ok
