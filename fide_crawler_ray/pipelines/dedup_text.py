"""Deduplication pipelines over a documents table (doc_id, text, ...).

Five operators, all expressed as Dataset pipelines:

- ``exact_dedup``: md5 fingerprint → hash groupby → keep min doc_id.
- ``minhash_lsh_dedup``: shingle → MinHash → LSH band buckets → candidate
  pairs → exact-Jaccard verification → connected components → survivors.
- ``simhash_dedup``: 64-bit SimHash → bit-band buckets → hamming-verified
  pairs → components → survivors.
- ``ngram_jaccard_pairs``: character-n-gram Jaccard verification over an
  explicit candidate pair set.
- ``embedding_cosine_dedup``: random-hyperplane LSH buckets over the
  embedding column → within-bucket pairwise cosine → pairs → survivors.

Scale notes: the corpus-sized stages (fingerprint, sketch, band
explosion, bucket groupby) are fully distributed; only the *verified
pair list* — the sparse tail of LSH — is collected for union-find
clustering, and the per-pair text lookup broadcasts only the texts named
by candidate pairs (``ray.put`` once, read per actor), never the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions import sketches as SK
from ..functions.textstats import fingerprint_batch


# ------------------------------------------------------------- exact

def exact_dedup(docs_ds):
    """Exact text dedup: keep the smallest doc_id per normalized-text
    fingerprint. Returns a Dataset of surviving (doc_id, md5_fp).

    Pure vectorized aggregate — the survivor is fully determined by
    (md5_fp, min doc_id), so no per-group Python and no join is needed."""
    from ray.data.aggregate import Min

    fps = docs_ds.map_batches(fingerprint_batch, batch_format="pyarrow")
    agg = fps.groupby("md5_fp").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id", "md5_fp"])


# ------------------------------------------------------- minhash + LSH

class _MinHashBands:
    def __init__(self, n_perm: int, n_bands: int, k_shingle: int):
        self.mh = SK.MinHasher(n_perm=n_perm)
        self.n_bands = n_bands
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        sigs = self.mh.signatures(batch["text"].to_pylist(), self.k)
        ids, keys = [], []
        for doc_id, sig in zip(doc_ids, sigs):
            for bk in SK.band_keys(sig, self.n_bands):
                ids.append(doc_id)
                keys.append(bk)
        return pa.table({"doc_id": pa.array(ids), "band_key": pa.array(keys, pa.binary())})


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(g["doc_id"].unique())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"a": a, "b": b})


class _VerifyJaccard:
    def __init__(self, texts_ref, threshold: float, k_shingle: int, char_n: int | None):
        self.texts = ray.get(texts_ref)
        self.t = threshold
        self.k = k_shingle
        self.char_n = char_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        sims = []
        for x, y in zip(a, b):
            tx, ty = self.texts.get(x, ""), self.texts.get(y, "")
            if self.char_n is None:
                sims.append(SK.jaccard(tx, ty, self.k))
            else:
                sims.append(SK.ngram_jaccard(tx, ty, self.char_n))
        t = batch.append_column("jaccard", pa.array(np.round(sims, 6), pa.float64()))
        return t.filter(pa.array([s >= self.t for s in sims]))


def _texts_for_pairs(docs_ds, pairs: list[tuple]) -> "ray.ObjectRef":
    needed = {x for p in pairs for x in p[:2]}
    sub = docs_ds.map_batches(
        lambda b: b.filter(
            pa.array([d in needed for d in b["doc_id"].to_pylist()])
        ).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )
    texts = {r["doc_id"]: r["text"] for r in sub.take_all()}
    return ray.put(texts)


def _survivors(docs_ds, verified_pairs: list[tuple]):
    """Union-find over verified pairs; survivors = cluster roots (min id)
    plus every doc in no cluster."""
    uf = SK.UnionFind()
    for a, b, *_ in verified_pairs:
        uf.union(a, b)
    dropped = {x for x, root in uf.groups().items() if root != x}
    dropped_ref = ray.put(dropped)

    def _filter(batch: pa.Table) -> pa.Table:
        drop = ray.get(dropped_ref)
        return batch.filter(
            pa.array([d not in drop for d in batch["doc_id"].to_pylist()])
        )

    return docs_ds.map_batches(_filter, batch_format="pyarrow")


def _dup_bucket_pairs(bands, key_col: str = "band_key"):
    """Candidate pairs from band rows, touching Python only for buckets
    that actually collide: a vectorized count aggregate finds buckets with
    ≥2 docs (the sparse tail), and only those go through the pairwise
    map_groups. A bare groupby().map_groups over every bucket costs one
    Python call per bucket (~n_docs × n_bands groups)."""
    from ..stages.fastagg import fast_groupby_agg

    bands = bands.materialize()  # sketched once; counted AND paired below
    counts = fast_groupby_agg(bands, [key_col], {"n": (None, "count")}).to_pandas()
    dup_keys = set(counts[counts["n"] >= 2][key_col])
    if not dup_keys:
        return None
    dref = ray.put(dup_keys)

    def _only_dups(b: pa.Table) -> pa.Table:
        keys = ray.get(dref)
        return b.filter(pa.array([k in keys for k in b[key_col].to_pylist()]))

    return bands.map_batches(_only_dups, batch_format="pyarrow").groupby(
        key_col
    ).map_groups(_bucket_pairs, batch_format="pandas")


def minhash_lsh_dedup(docs_ds, threshold: float = 0.7, n_perm: int = 128,
                      n_bands: int = 16, k_shingle: int = 3):
    """MinHash+LSH near-dedup. Returns (survivors_ds, verified_pairs)."""
    # task-pool stage: MinHasher state (two rng-derived coefficient
    # arrays) rebuilds in microseconds, so tasks beat actor-pool spin-up
    stage = _MinHashBands(n_perm, n_bands, k_shingle)
    bands = docs_ds.map_batches(
        stage, batch_format="pyarrow", batch_size=1024,
    )
    cand = _dup_bucket_pairs(bands)
    if cand is None:
        return docs_ds, []
    cand_pairs = sorted({(r["a"], r["b"]) for r in cand.take_all()})
    if not cand_pairs:
        return docs_ds, []
    texts_ref = _texts_for_pairs(docs_ds, cand_pairs)
    pair_t = pa.table({"a": pa.array([p[0] for p in cand_pairs]),
                       "b": pa.array([p[1] for p in cand_pairs])})
    import ray.data as rd

    verified = rd.from_arrow(pair_t).map_batches(
        _VerifyJaccard, fn_constructor_args=(texts_ref, threshold, k_shingle, None),
        batch_format="pyarrow", batch_size=2048, concurrency=2, num_cpus=0.5,
    )
    vp = [(r["a"], r["b"], r["jaccard"]) for r in verified.take_all()]
    return _survivors(docs_ds, vp), vp


def ngram_jaccard_pairs(docs_ds, pairs: list[tuple], threshold: float = 0.5,
                        char_n: int = 5):
    """Character-n-gram Jaccard verification over explicit candidates."""
    import ray.data as rd

    texts_ref = _texts_for_pairs(docs_ds, pairs)
    pair_t = pa.table({"a": pa.array([p[0] for p in pairs]),
                       "b": pa.array([p[1] for p in pairs])})
    return rd.from_arrow(pair_t).map_batches(
        _VerifyJaccard, fn_constructor_args=(texts_ref, threshold, 3, char_n),
        batch_format="pyarrow", batch_size=2048, concurrency=2, num_cpus=0.5,
    )


# ------------------------------------------------------------ simhash

class _SimHashBands:
    def __init__(self, n_bands: int):
        self.n_bands = n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, keys, hashes = [], [], []
        out_h = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            h = SK.simhash64(text)
            out_h.append(h)
            for bk in SK.simhash_band_keys(h, self.n_bands):
                ids.append(doc_id)
                keys.append(bk)
                hashes.append(h)
        return pa.table({
            "doc_id": pa.array(ids),
            "band_key": pa.array(keys, pa.binary()),
            "simhash": pa.array(np.array(hashes, dtype=np.uint64).astype(np.int64)),
        })


def simhash_dedup(docs_ds, max_hamming: int = 3, n_bands: int = 4):
    """SimHash near-dedup: docs within hamming distance ≤ max_hamming of
    a smaller-id doc are dropped. Returns (survivors_ds, verified_pairs)."""
    bands = docs_ds.map_batches(
        _SimHashBands(n_bands), batch_format="pyarrow", batch_size=1024,
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].tolist()
        hs = rows["simhash"].tolist()
        a, b, d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                hd = SK.hamming64(np.uint64(hs[i]).item() & ((1 << 64) - 1),
                                  np.uint64(hs[j]).item() & ((1 << 64) - 1))
                if hd <= max_hamming:
                    a.append(ids[i])
                    b.append(ids[j])
                    d.append(hd)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    from ..stages.fastagg import fast_groupby_agg

    bands = bands.materialize()  # sketched once; counted AND paired below
    counts = fast_groupby_agg(bands, ["band_key"], {"n": (None, "count")}).to_pandas()
    dup_keys = set(counts[counts["n"] >= 2]["band_key"])
    if not dup_keys:
        return docs_ds, []
    dref = ray.put(dup_keys)

    def _only_dups(b: pa.Table) -> pa.Table:
        keys = ray.get(dref)
        return b.filter(pa.array([k in keys for k in b["band_key"].to_pylist()]))

    pairs = bands.map_batches(_only_dups, batch_format="pyarrow").groupby(
        "band_key"
    ).map_groups(_pairs, batch_format="pandas")
    vp = sorted({(r["a"], r["b"], r["hamming"]) for r in pairs.take_all()})
    return _survivors(docs_ds, vp), vp


# ------------------------------------------- embedding cosine near-dup

class _HyperplaneBucket:
    def __init__(self, planes_ref):
        self.planes = ray.get(planes_ref) if not isinstance(planes_ref, np.ndarray) else planes_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.ann import _normalize, _to_matrix

        vecs = _normalize(_to_matrix(batch["embedding"]))
        signs = (vecs @ self.planes.T) > 0  # (n, nbits)
        keys = (signs.astype(np.int64) * (1 << np.arange(signs.shape[1], dtype=np.int64))).sum(axis=1)
        return pa.table({
            "vec_id": batch["vec_id"],
            "bucket": pa.array(keys, pa.int64()),
            "embedding": batch["embedding"],
        })


def embedding_cosine_dedup(embeddings_ds, threshold: float = 0.95,
                           nbits: int = 12, dim: int = 64, seed: int = 99):
    """Embedding near-dup: random-hyperplane LSH buckets, pairwise cosine
    within buckets, drop the larger vec_id of each ≥threshold pair.
    Returns (survivors_ds, verified_pairs)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((nbits, dim)).astype(np.float32)
    pref = ray.put(planes)
    bucketed = embeddings_ds.map_batches(
        _HyperplaneBucket, fn_constructor_args=(pref,),
        batch_format="pyarrow", batch_size=4096, concurrency=4, num_cpus=0.5,
    )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        m = np.stack([np.asarray(v, dtype=np.float32) for v in g["embedding"]])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sims = m @ m.T
        ids = g["vec_id"].tolist()
        a, b, s = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sims[i, j] >= threshold:
                    a.append(ids[i])
                    b.append(ids[j])
                    s.append(round(float(sims[i, j]), 6))
        return pd.DataFrame({"a": a, "b": b, "cosine": s})

    pairs = bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
    vp = sorted({(int(r["a"]), int(r["b"]), r["cosine"]) for r in pairs.take_all()})
    uf = SK.UnionFind()
    for a, b, _ in vp:
        uf.union(a, b)
    dropped = {x for x, root in uf.groups().items() if root != x}
    dref = ray.put(dropped)

    def _filter(batch: pa.Table) -> pa.Table:
        drop = ray.get(dref)
        return batch.filter(
            pa.array([int(v) not in drop for v in batch["vec_id"].to_pylist()])
        )

    return embeddings_ds.map_batches(_filter, batch_format="pyarrow"), vp
