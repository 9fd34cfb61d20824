"""Numeric quality gates for the APPROXIMATE operators.

Every probabilistic / sketch-based operator in the engine
(MinHash+LSH, SimHash, HLL, Misra-Gries, histogram quantiles, IVF,
k-means) is rows-only for the driver — there is no SQL oracle for a
randomized algorithm. These queries close that evidence gap: each one
measures the approximate operator against its EXACT counterpart **on
the same corpus, computed by the engine itself**, asserts the
algorithm's published error bound (so a quality regression fails the
run rather than drifting silently), and returns the measured numbers
as a row the driver records.

Gate design rule: the exact side must be an engine pipeline with its
own green oracle (similarity_join, grouped_distinct_count, …) or a
bound-size brute force over SKETCH values (64-bit signatures, never
the corpus) — capped and deterministic so the gate itself scales.

Reference parity note: the reference (rafaelvleite/fide_crawler) has
no approximate operators — these gates guard the engine's 100-TB
extensions, per the LLM-data-pipeline scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import ann as ANN
from ..functions import sketches as SK
from ..stages.fastagg import fast_groupby_agg
from . import dedup_text as DT

# Ground-truth brute force over 64-bit signatures is O(sample²) popcounts;
# 20k keeps it < 1 s vectorized while sampling far beyond where the LSH
# banding behaves differently. Deterministic lowest-doc_id prefix, so the
# gate is stable across runs and cluster sizes.
SIMHASH_GT_SAMPLE = 20_000


def _pair_set(df: pd.DataFrame) -> set:
    a = df["a"].to_numpy()
    b = df["b"].to_numpy()
    return set(zip(np.minimum(a, b).tolist(), np.maximum(a, b).tolist()))


def q_dedup_minhash_recall(sf_dir):
    """Precision/recall of the MinHash+LSH near-dedup's verified pair set
    against the EXACT set-similarity self-join (q_similarity_join, which
    has its own bit-exact DuckDB oracle) at the same threshold and the
    same word-3-shingle Jaccard. Precision is structurally 1.0 (LSH
    candidates are exact-Jaccard-verified before use); recall measures
    what the banding misses (1 − (1 − t^r)^b per pair). Both sides are
    PAIR sets — output-sized, never corpus-sized — so collecting them is
    as cheap as returning any query result. Asserts recall ≥ 0.9
    (measured 1.0 at sf0.01 and sf0.1: the synthetic near-dups sit well
    above the 16-band/8-row S-curve midpoint of ~0.71)."""
    from .queries import T, to_df_any
    from .relational import q_similarity_join

    thr = 0.7
    exact = _pair_set(to_df_any(q_similarity_join(sf_dir, threshold=thr)))
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    _, verified = DT.minhash_lsh_dedup(docs, threshold=thr)
    lsh = _pair_set(to_df_any(verified))
    hit = len(exact & lsh)
    recall = hit / max(len(exact), 1)
    precision = hit / max(len(lsh), 1)
    assert recall >= 0.9, f"MinHash LSH recall regressed: {recall:.3f} < 0.9"
    assert precision == 1.0, (
        f"MinHash verified pairs contain non-pairs: precision {precision:.3f}"
    )
    return pd.DataFrame([{
        "n_exact_pairs": len(exact), "n_lsh_pairs": len(lsh),
        "n_hit": hit, "recall_x1e6": int(round(recall * 1e6)),
        "precision_x1e6": int(round(precision * 1e6)),
    }])


def q_dedup_simhash_recall(sf_dir):
    """Recall of the SimHash band-LSH pair set against BRUTE-FORCE
    hamming distance over the 64-bit signatures themselves. With 4
    bands of 16 bits, any pair with hamming ≤ 3 < n_bands leaves one
    band untouched (pigeonhole), so recall is exactly 1.0 unless a
    bucket overflows bucket_cap (star-pair degradation) — asserted
    ≥ 0.99 to leave room only for that documented cap. Ground truth is
    computed over SIGNATURES (8 bytes/doc), not texts, on a
    deterministic ≤ SIMHASH_GT_SAMPLE lowest-doc_id sample: the gate's
    brute force stays bounded at any corpus size while the LSH side
    runs the full distributed pipeline."""
    from .queries import T, to_df_any

    max_hamming = 3
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    _, verified = DT.simhash_dedup(docs, max_hamming=max_hamming)
    lsh_all = to_df_any(verified)

    sigs = docs.map_batches(
        lambda b: pa.table({
            "doc_id": b["doc_id"],
            "sig": pa.array(
                np.array([SK.simhash64(t) for t in b["text"].to_pylist()],
                         dtype=np.uint64).astype(np.int64), pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("doc_id").limit(SIMHASH_GT_SAMPLE).to_pandas()
    ids = sigs["doc_id"].to_numpy()
    hs = sigs["sig"].to_numpy().astype(np.uint64)
    sample = set(ids.tolist())

    true_pairs: set = set()
    for i in range(len(ids) - 1):
        x = (hs[i] ^ hs[i + 1:]).view(np.uint8).reshape(-1, 8)
        hd = np.unpackbits(x, axis=1).sum(axis=1)
        for j in np.nonzero(hd <= max_hamming)[0]:
            true_pairs.add((ids[i], ids[i + 1 + j]))

    lsh = {p for p in _pair_set(lsh_all)
           if p[0] in sample and p[1] in sample}
    hit = len(true_pairs & lsh)
    recall = hit / max(len(true_pairs), 1)
    assert recall >= 0.99, (
        f"SimHash band recall broke the pigeonhole contract: {recall:.4f}"
    )
    return pd.DataFrame([{
        "n_docs_sampled": len(ids), "n_true_pairs": len(true_pairs),
        "n_lsh_pairs": len(lsh), "recall_x1e6": int(round(recall * 1e6)),
    }])


def q_heavy_hitters_err(sf_dir):
    """Misra-Gries error audit: exact counts for every reported term
    (computed DISTRIBUTED — the reported ≤ top terms broadcast into a
    map_batches counting stage, so only a top-row partial per block
    moves) vs the sketch estimates. Asserts the MG mergeable-summary
    guarantee (Agarwal et al., PODS'12): estimates never exceed true
    counts and per-term undercount ≤ N_tokens/(k+1)."""
    from .relational import _TOKEN, MG_CAPACITY, T, q_heavy_hitters

    est = q_heavy_hitters(sf_dir)
    terms = est["term"].tolist()
    term_set = frozenset(terms)

    def _partial(b: pa.Table) -> pa.Table:
        counts = dict.fromkeys(terms, 0)
        total = 0
        for txt in b["text"].to_pylist():
            for t in _TOKEN.findall(txt.lower()):
                total += 1
                if t in term_set:
                    counts[t] += 1
        return pa.table({
            "term": pa.array(list(counts) + ["\x00total"], pa.string()),
            "cnt": pa.array(list(counts.values()) + [total], pa.int64()),
        })

    exact = fast_groupby_agg(
        T(sf_dir, "documents", ["text"]).map_batches(
            _partial, batch_format="pyarrow"),
        ["term"], {"cnt": ("cnt", "sum")},
    ).to_pandas()  # ≤ top+1 rows
    n_tokens = int(exact.loc[exact["term"] == "\x00total", "cnt"].iloc[0])
    true = dict(zip(exact["term"], exact["cnt"]))
    bound = n_tokens / (MG_CAPACITY + 1)

    out = est.copy()
    out["true_count"] = out["term"].map(true).astype(np.int64)
    out["undercount"] = out["true_count"] - out["est_count"]
    assert (out["undercount"] >= 0).all(), out.to_dict("records")
    assert (out["undercount"] <= bound).all(), (bound, out.to_dict("records"))
    return out[["term", "est_count", "true_count", "undercount"]]


def q_approx_quantiles_err(sf_dir):
    """Rank error of the histogram-sketch quantiles vs the exact CDF,
    computed distributed: one map_batches pass counts, per approximate
    quantile value, how many rows fall at or below it (a 3-int partial
    per block), so the exact rank needs no sort and no value exchange.
    Asserts rank error < 0.005 (= one 8192-bin mass at these data)."""
    from .relational import T, q_approx_quantiles

    row = q_approx_quantiles(sf_dir).iloc[0]
    targets = [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)]
    vals = np.array([row[name] for name, _ in targets], dtype=np.float64)

    def _partial(b: pa.Table) -> pa.Table:
        v = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        le = (v[:, None] <= vals[None, :]).sum(axis=0).astype(np.int64)
        return pa.table({
            "q": pa.array([n for n, _ in targets], pa.string()),
            "n_le": pa.array(le, pa.int64()),
            "n": pa.array([len(v)] * len(targets), pa.int64()),
        })

    agg = fast_groupby_agg(
        T(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
            _partial, batch_format="pyarrow"),
        ["q"], {"n_le": ("n_le", "sum"), "n": ("n", "sum")},
    ).to_pandas().set_index("q")  # 3 rows

    recs = []
    for name, q in targets:
        rank = agg.loc[name, "n_le"] / agg.loc[name, "n"]
        err = abs(rank - q)
        assert err < 0.005, (name, row[name], rank)
        recs.append({"q": name, "approx_value": float(row[name]),
                     "rank_x1e6": int(round(rank * 1e6)),
                     "rank_err_x1e6": int(round(err * 1e6))})
    return pd.DataFrame(recs)


def q_hll_err(sf_dir):
    """HLL relative-error gate, global + grouped: re-uses q_hll_distinct
    (p=14, vs the exact distinct count) and q_grouped_hll (p=12, vs the
    exact grouped distinct) — both already compute approx AND exact in
    one plan — and asserts the 3σ standard-error bounds (1.04/√2^p:
    2.5% at p=14, 5% at p=12)."""
    from .queries import to_df_any
    from .relational import q_grouped_hll, q_hll_distinct

    g = to_df_any(q_hll_distinct(sf_dir)).iloc[0]
    assert g["rel_err"] < 0.025, dict(g)
    grouped = to_df_any(q_grouped_hll(sf_dir))
    assert (grouped["rel_err"] < 0.05).all(), grouped.to_dict("records")
    rows = [{"scope": "global", "rel_err_x1e6": int(round(g["rel_err"] * 1e6))}]
    rows += [{"scope": f"group:{r.event_type}",
              "rel_err_x1e6": int(round(r.rel_err * 1e6))}
             for r in grouped.itertuples()]
    return pd.DataFrame(rows)


def q_kmeans_quality(sf_dir, k: int = 8, iters: int = 5):
    """Lloyd-improvement gate for the distributed spherical k-means: the
    mean cosine of each vector to its nearest centroid must not
    DECREASE from the deterministic init to the trained centroids
    (Lloyd is monotone in the quantization objective; the map_batches
    assignment pass emits one scalar partial per block). Asserts
    obj(trained) ≥ obj(init) and returns both, fixed-point."""
    import ray

    from .queries import T

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    init = ANN.sample_centroids(emb, k)
    trained = ANN.kmeans_centroids(emb, n_centroids=k, iters=iters)

    def _objective(cents: np.ndarray) -> float:
        cref = ray.put(cents)

        def _partial(b: pa.Table) -> pa.Table:
            c = ray.get(cref)
            vecs = ANN._normalize(ANN._to_matrix(b["embedding"]))
            best = (vecs @ c.T).max(axis=1).astype(np.float64)
            return pa.table({"n": pa.array([len(best)], pa.int64()),
                             "s": pa.array([float(best.sum())], pa.float64())})

        parts = emb.map_batches(_partial, batch_format="pyarrow")
        tot = fast_groupby_agg(
            parts.map_batches(
                lambda b: b.append_column("g", pa.array([0] * b.num_rows,
                                                        pa.int64())),
                batch_format="pyarrow"),
            ["g"], {"n": ("n", "sum"), "s": ("s", "sum")},
        ).to_pandas().iloc[0]
        return float(tot["s"]) / max(int(tot["n"]), 1)

    obj0, obj1 = _objective(init), _objective(trained)
    # float-sum order varies with block boundaries → compare with a hair
    # of slack and report coarse fixed-point (1e-9 objective noise is
    # not a quality signal)
    assert obj1 >= obj0 - 1e-9, (obj0, obj1)
    return pd.DataFrame([{
        "k": k, "iters": iters,
        "obj_init_x1e6": int(round(obj0 * 1e6)),
        "obj_trained_x1e6": int(round(obj1 * 1e6)),
        "improved": bool(obj1 >= obj0),
    }])


NGRAM_GT_SAMPLE = 300      # brute force = sample²/2 set intersections
EMB_GT_SAMPLE = 4_000      # brute force = one sample² matmul


def q_dedup_ngram_recall(sf_dir):
    """Precision/recall of the char-5-gram Jaccard near-dedup's verified
    pair set against BRUTE-FORCE exact shingle-set Jaccard on a
    deterministic lowest-doc_id sample (bounded at NGRAM_GT_SAMPLE, so
    the gate stays O(sample²) at any corpus size). Precision is
    structurally 1.0 (candidates are exact-Jaccard-verified); recall
    measures what the banding misses."""
    from .queries import T, to_df_any

    thr, char_n = 0.8, 5
    docs = T(sf_dir, "documents", ["doc_id", "text"])
    _, verified = DT.ngram_jaccard_dedup(docs, threshold=thr,
                                         char_n=char_n)
    sample_df = docs.sort("doc_id").limit(NGRAM_GT_SAMPLE).to_pandas()
    ids = sample_df["doc_id"].to_numpy()
    sets = [np.unique(SK._hash64(SK.char_shingles(t, char_n)))
            for t in sample_df["text"]]
    true_pairs: set = set()
    for i in range(len(ids) - 1):
        for j in range(i + 1, len(ids)):
            inter = len(np.intersect1d(sets[i], sets[j],
                                       assume_unique=True))
            union = len(sets[i]) + len(sets[j]) - inter
            if union and inter / union >= thr:
                true_pairs.add((ids[i], ids[j]))
    sample = set(ids.tolist())
    vdf = to_df_any(verified)
    lsh = set() if "a" not in vdf.columns else {
        p for p in _pair_set(vdf)
        if p[0] in sample and p[1] in sample}
    hit = len(true_pairs & lsh)
    recall = hit / len(true_pairs) if true_pairs else 1.0
    precision = hit / len(lsh) if lsh else 1.0
    assert recall >= 0.9, f"ngram LSH recall regressed: {recall:.3f}"
    assert precision == 1.0, f"ngram precision {precision:.3f} < 1"
    return pd.DataFrame([{
        "n_docs_sampled": len(ids), "n_true_pairs": len(true_pairs),
        "n_lsh_pairs": len(lsh), "n_hit": hit,
        "recall_x1e6": int(round(recall * 1e6)),
        "precision_x1e6": int(round(precision * 1e6)),
    }])


def _planted_embeddings(sf_dir, plant_every: int):
    """Deterministic planted-near-dup corpus for the embedding dedup
    gates: the natural synthetic embeddings are mutually far apart
    (max cosine ≈ 0.51), so every ``plant_every``-th sampled vector
    gains an index-seeded jittered copy (cosine ≥ ~0.999) under
    vec_id + 1e9. Returns (aug_tbl, ids, planted_rows, aug_ids, aug)."""
    from .queries import T

    sample_df = T(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .sort("vec_id").limit(EMB_GT_SAMPLE).to_pandas()
    ids = sample_df["vec_id"].to_numpy(np.int64)
    m = np.stack([np.asarray(v, dtype=np.float32)
                  for v in sample_df["embedding"]])
    planted_rows = np.arange(0, len(ids), plant_every)
    jit = m[planted_rows].copy()
    for r, row in zip(planted_rows, range(len(jit))):
        rng = np.random.default_rng(1000 + int(ids[r]))
        jit[row] += 0.02 * rng.standard_normal(m.shape[1]) \
            .astype(np.float32)
    aug_ids = np.concatenate([ids, ids[planted_rows] + 1_000_000_000])
    aug = np.concatenate([m, jit])
    aug_tbl = pa.table({
        "vec_id": pa.array(aug_ids, pa.int64()),
        # list<float32>, matching the parquet layout the ops consume
        "embedding": pa.array(
            [v.tolist() for v in aug.astype(np.float32)],
            type=pa.list_(pa.float32())),
    })
    return aug_tbl, ids, planted_rows, aug_ids, aug


def q_semdedup_recall(sf_dir, plant_every: int = 4):
    """SemDeDup quality gate on planted near-dups: every planted copy
    must be dropped (its original is the nearest vector by a wide
    margin, so both land in the same k-means cluster), and NO natural
    vector may be dropped (natural max cosine ≈ 0.51 ≪ 0.98). Asserts
    drop-recall ≥ 0.9 and zero natural drops, and returns the measured
    numbers as the driver-visible row."""
    import ray.data as rd

    aug_tbl, ids, planted_rows, aug_ids, _ = _planted_embeddings(
        sf_dir, plant_every)
    survivors, pairs = DT.semdedup(
        rd.from_arrow(aug_tbl), threshold=0.98)
    kept = set(survivors.select_columns(["vec_id"]).to_pandas()
               ["vec_id"].tolist())
    planted_ids = set((ids[planted_rows] + 1_000_000_000).tolist())
    dropped = set(aug_ids.tolist()) - kept
    hit = len(dropped & planted_ids)
    recall = hit / len(planted_ids) if planted_ids else 1.0
    natural_dropped = len(dropped - planted_ids)
    assert recall >= 0.9, f"semdedup drop-recall regressed: {recall:.3f}"
    assert natural_dropped == 0, \
        f"semdedup dropped {natural_dropped} natural vectors"
    return pd.DataFrame([{
        "n_vecs": len(aug_ids), "n_planted": len(planted_ids),
        "n_dropped": len(dropped), "n_hit": hit,
        "recall_x1e6": int(round(recall * 1e6)),
        "natural_dropped": natural_dropped,
    }])


def q_quantized_ann_recall(sf_dir, k: int = 10):
    """Scalar-quantization quality gate: embeddings compressed to int8
    (per-vector symmetric max-abs scale — 4× smaller, the standard
    production ANN memory lever) must preserve brute-force top-k:
    recall@10 of the quantized search vs the full-precision search
    (which has its own exact oracle) asserted ≥ 0.9. The quantized
    path runs the SAME distributed brute-force kernel over a
    re-materialized int8→float corpus, so the gate measures the
    quantization error, not a different algorithm."""
    import ray.data as rd

    from .queries import T, _queries_matrix

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _queries_matrix(sf_dir)
    full = ANN.brute_force_topk(emb, q, k=k).to_pandas()

    def _quant(b: pa.Table) -> pa.Table:
        col = b["embedding"]
        la = (col.combine_chunks()
              if isinstance(col, pa.ChunkedArray) else col)
        m = la.values.to_numpy(zero_copy_only=False).astype(
            np.float32).reshape(b.num_rows, -1)
        scale = np.abs(m).max(axis=1, keepdims=True)
        scale[scale == 0] = 1.0
        q8 = np.clip(np.round(m / scale * 127.0), -127, 127)
        deq = (q8 * scale / 127.0).astype(np.float32)
        return pa.table({
            "vec_id": b["vec_id"],
            "embedding": pa.array([v.tolist() for v in deq],
                                  type=pa.list_(pa.float32())),
        })

    quant = emb.map_batches(_quant, batch_format="pyarrow")
    qres = ANN.brute_force_topk(quant, q, k=k).to_pandas()
    hits = tot = 0
    for qid, g in full.groupby("query_id"):
        truth = set(g["vec_id"])
        got = set(qres[qres["query_id"] == qid]["vec_id"])
        hits += len(truth & got)
        tot += len(truth)
    recall = hits / max(tot, 1)
    assert recall >= 0.9, f"int8 quantization recall {recall:.3f}"
    return pd.DataFrame([{
        "k": k, "n_queries": full["query_id"].nunique(),
        "n_hits": hits, "n_truth": tot,
        "recall_x1e6": int(round(recall * 1e6)),
    }])


def q_dedup_embedding_recall(sf_dir, plant_every: int = 4):
    """Precision/recall of the hyperplane-LSH embedding near-dedup on
    PLANTED near-duplicates: the synthetic embeddings are mutually far
    apart (max cosine ≈ 0.51), so a gate over the natural corpus would
    be vacuous — instead every ``plant_every``-th sampled vector gains a
    deterministically jittered copy (cosine ≥ ~0.999), the full operator
    runs on the augmented Dataset, and recall is measured against the
    BRUTE-FORCE cosine ≥ τ pair set of the augmented sample (one
    sample² float32 matmul, bounded at EMB_GT_SAMPLE). Precision is
    structurally 1.0 (bucket candidates are exact-cosine-verified)."""
    import ray.data as rd

    from .queries import to_df_any

    thr = 0.98
    aug_tbl, ids, planted_rows, aug_ids, aug = _planted_embeddings(
        sf_dir, plant_every)
    _, verified = DT.embedding_cosine_dedup(
        rd.from_arrow(aug_tbl), threshold=thr)

    norms = np.linalg.norm(aug, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nm = aug / norms
    sim = nm @ nm.T
    iu = np.triu_indices(len(aug_ids), k=1)
    hitmask = sim[iu] >= thr
    true_pairs = set(zip(
        np.minimum(aug_ids[iu[0][hitmask]], aug_ids[iu[1][hitmask]])
        .tolist(),
        np.maximum(aug_ids[iu[0][hitmask]], aug_ids[iu[1][hitmask]])
        .tolist()))
    vdf = to_df_any(verified)
    lsh = set() if "a" not in vdf.columns else _pair_set(vdf)
    hit = len(true_pairs & lsh)
    recall = hit / len(true_pairs) if true_pairs else 1.0
    precision = hit / len(lsh) if lsh else 1.0
    assert len(true_pairs) >= len(planted_rows), "planting failed"
    assert recall >= 0.8, f"embedding LSH recall regressed: {recall:.3f}"
    assert precision == 1.0, f"embedding precision {precision:.3f} < 1"
    return pd.DataFrame([{
        "n_vecs_sampled": len(aug_ids), "n_true_pairs": len(true_pairs),
        "n_lsh_pairs": len(lsh), "n_hit": hit,
        "recall_x1e6": int(round(recall * 1e6)),
        "precision_x1e6": int(round(precision * 1e6)),
    }])



def q_pq_ann_recall(sf_dir, m: int = 16, ks: int = 16, iters: int = 5,
                    shortlist: int = 100, k: int = 10):
    """Product-quantization ANN gate — the third leg of the engine's
    quantized-retrieval triad (IVF partitions the corpus, int8 SQ
    shrinks vectors 4x, PQ shrinks them ~16x: 64 float32 dims -> 16
    byte codes). Per-subspace codebooks train by DISTRIBUTED Lloyd
    (per batch: subvector assignments -> (subspace, code, n, sum)
    partials, m*ks rows per batch regardless of corpus size); search
    is one asymmetric-distance pass (per-query m*ks lookup tables,
    gather-sum per batch) emitting per-batch local top-``shortlist``
    candidates WITH their exact cosine (the full vector is in hand in
    the same batch), then an output-sized reduce: global ADC shortlist
    -> exact re-rank -> top-k. Recall@10 vs the full-precision
    brute-force truth asserted >= 0.8 (synthetic near-uniform vectors
    are PQ's WORST case - no cluster structure for the codebooks to
    exploit; production corpora cluster and do better).
    """
    import ray

    from .queries import T, _queries_matrix

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = _queries_matrix(sf_dir)
    truth = ANN.brute_force_topk(emb, q, k=k).to_pandas()

    emb = emb.materialize()  # pinned blocks: reread per Lloyd round is waste
    d = len(emb.take(1)[0]["embedding"])
    ds = d // m
    qn = ANN._normalize(np.asarray(q, dtype=np.float32)).astype(np.float64)

    # init: the ks smallest vec_ids (deterministic, one bounded pull)
    init = emb.filter(expr=f"vec_id < {ks}").to_pandas().sort_values("vec_id")
    mat0 = ANN._normalize(
        np.stack([np.asarray(v, np.float32) for v in init["embedding"]])
    ).astype(np.float64)
    books = np.stack([mat0[:, s * ds:(s + 1) * ds] for s in range(m)])

    def _train_partial(bref):
        def _f(b: pa.Table) -> pa.Table:
            bk = ray.get(bref)  # (m, ks, ds)
            x = ANN._normalize(ANN._to_matrix(b["embedding"])).astype(np.float64)
            rows_s, rows_c, rows_n, rows_sum = [], [], [], []
            for s in range(m):
                xs = x[:, s * ds:(s + 1) * ds]
                d2 = ((xs[:, None, :] - bk[s][None, :, :]) ** 2).sum(-1)
                a = d2.argmin(1)
                sums = np.zeros((ks, ds))
                np.add.at(sums, a, xs)
                cnt = np.bincount(a, minlength=ks).astype(np.int64)
                rows_s.append(np.full(ks, s, np.int64))
                rows_c.append(np.arange(ks, dtype=np.int64))
                rows_n.append(cnt)
                rows_sum.append(sums)
            return pa.table({
                "s": pa.array(np.concatenate(rows_s)),
                "c": pa.array(np.concatenate(rows_c)),
                "n": pa.array(np.concatenate(rows_n)),
                "sum": pa.array(list(np.concatenate(rows_sum)),
                                pa.list_(pa.float64())),
            })
        return _f

    for _ in range(iters):
        bref = ray.put(books)
        parts = emb.map_batches(
            _train_partial(bref), batch_format="pyarrow",
            batch_size=4096, num_cpus=0.5).to_pandas()
        sums = np.zeros((m, ks, ds))
        cnts = np.zeros((m, ks), np.int64)
        si = parts["s"].to_numpy()
        ci = parts["c"].to_numpy()
        np.add.at(cnts, (si, ci), parts["n"].to_numpy())
        np.add.at(sums, (si, ci), np.stack(parts["sum"].to_numpy()))
        ne = cnts > 0
        books = books.copy()
        books[ne] = sums[ne] / cnts[ne][:, None]

    bref = ray.put(books)
    qref = ray.put(qn)

    class _AdcSearch:
        def __init__(self):
            self.bk = ray.get(bref)
            qm = ray.get(qref)
            # per-query ADC tables: (nq, m, ks)
            self.tab = np.stack([
                ((self.bk[s][None, :, :]
                  - qm[:, s * ds:(s + 1) * ds][:, None, :]) ** 2).sum(-1)
                for s in range(m)
            ], axis=1)
            self.qm = qm

        def __call__(self, b: pa.Table) -> pa.Table:
            x = ANN._normalize(ANN._to_matrix(b["embedding"]))
            ids = b["vec_id"].to_numpy(zero_copy_only=False)
            codes = np.empty((x.shape[0], m), np.int64)
            xd = x.astype(np.float64)
            for s in range(m):
                xs = xd[:, s * ds:(s + 1) * ds]
                codes[:, s] = ((xs[:, None, :]
                                - self.bk[s][None, :, :]) ** 2).sum(-1)                     .argmin(1)
            nq = self.tab.shape[0]
            out_q, out_id, out_adc, out_cos = [], [], [], []
            exact = xd @ self.qm.T  # (n, nq) exact cosine, same batch
            for j in range(nq):
                score = self.tab[j][np.arange(m)[:, None],
                                    codes.T].sum(axis=0)
                kk = min(shortlist, len(score))
                idx = np.argpartition(score, kk - 1)[:kk] \
                    if kk < len(score) else np.arange(len(score))
                out_q.extend([j] * len(idx))
                out_id.extend(ids[idx].tolist())
                out_adc.extend(score[idx].tolist())
                out_cos.extend(exact[idx, j].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "adc": pa.array(out_adc, pa.float64()),
                "cos": pa.array(out_cos, pa.float64()),
            })

    cands = emb.map_batches(
        _AdcSearch, batch_format="pyarrow", batch_size=4096,
        concurrency=4, num_cpus=0.5).to_pandas()

    hits = tot = 0
    for qid, g in truth.groupby("query_id"):
        c = cands[cands["query_id"] == qid] \
            .sort_values(["adc", "vec_id"]).head(shortlist)
        got = set(c.sort_values(["cos", "vec_id"],
                                ascending=[False, True])
                  .head(k)["vec_id"])
        tset = set(g["vec_id"])
        hits += len(tset & got)
        tot += len(tset)
    recall = hits / max(tot, 1)
    assert recall >= 0.8, f"PQ shortlist+rerank recall {recall:.3f}"
    return pd.DataFrame([{
        "m": m, "ks": ks, "shortlist": shortlist, "k": k,
        "n_hits": hits, "n_truth": tot,
        "recall_x1e6": int(round(recall * 1e6)),
    }])



import functools
import tempfile


@functools.lru_cache(maxsize=4)
def _ivf_store_dir(sf_dir: str) -> tuple:
    """Build (once per sf per session) the persisted bucket-partitioned
    IVF index under /tmp; returns (index_dir, centroids_bytes, shape)."""
    from .queries import T

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = ANN.kmeans_centroids(emb, 16, iters=3)
    out = tempfile.mkdtemp(prefix="fcray_ivf_", dir="/tmp") + "/index"
    ANN.build_ivf_store(emb, cents, out)
    return out, cents.tobytes(), cents.shape


def q_ann_ivf_persisted(sf_dir, k: int = 10, nprobe: int = 8):
    """Persisted-IVF retrieval gate — the at-rest scale path for vector
    search: the corpus is written ONCE partitioned by IVF bucket
    (hive layout), and each query batch reads ONLY its nprobe probed
    bucket directories — file-level pruning by construction, the
    prune-at-the-read contract applied to ANN. Asserts (a) the pruned
    read touched a strict subset of the corpus and (b) recall@10 vs
    the full-precision brute force (its own exact oracle) >= 0.7 — the
    same bar as the in-memory ann_ivf_recall gate. Reports rows-read /
    corpus-rows so the driver records the prune ratio."""
    from .queries import T, _queries_matrix

    emb = T(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_corpus = emb.count()
    q = _queries_matrix(sf_dir)
    truth = ANN.brute_force_topk(emb, q, k=k).to_pandas()

    index_dir, cbytes, cshape = _ivf_store_dir(sf_dir)
    cents = np.frombuffer(cbytes, dtype=np.float32).reshape(cshape)
    res, n_read, n_buckets = ANN.ivf_search_persisted(
        index_dir, cents, q, k=k, nprobe=nprobe)
    got = res.to_pandas()
    # single-query prune measurement: one query's probes open nprobe of
    # the 16 bucket directories, so the pruned read is sub-corpus by
    # construction (the 5-query UNION above may legitimately cover all)
    _, n_read_1q, n_buckets_1q = ANN.ivf_search_persisted(
        index_dir, cents, q[:1], k=k, nprobe=nprobe)

    hits = tot = 0
    for qid, g in truth.groupby("query_id"):
        tset = set(g["vec_id"])
        gset = set(got[got["query_id"] == qid]["vec_id"])
        hits += len(tset & gset)
        tot += len(tset)
    recall = hits / max(tot, 1)
    import glob as _glob
    import os as _os
    n_buckets_total = len(_glob.glob(_os.path.join(index_dir,
                                                   "ivf_bucket=*")))
    assert n_read_1q < n_corpus, (
        f"single-query pruned read touched the whole corpus "
        f"({n_read_1q}/{n_corpus} from {n_buckets_1q} buckets)")
    assert recall >= 0.7, f"persisted-IVF recall {recall:.3f}"
    return pd.DataFrame([{
        "n_corpus": int(n_corpus), "n_rows_read": int(n_read),
        "n_buckets_read": int(n_buckets),
        "n_buckets_total": int(n_buckets_total), "nprobe": nprobe,
        "union_read_x1e6": int(round(n_read / n_corpus * 1e6)),
        "prune_1q_x1e6": int(round(n_read_1q / n_corpus * 1e6)),
        "n_hits": hits, "n_truth": tot,
        "recall_x1e6": int(round(recall * 1e6)),
    }])


QUERIES = {
    "dedup_minhash_recall": q_dedup_minhash_recall,
    "dedup_simhash_recall": q_dedup_simhash_recall,
    "heavy_hitters_err": q_heavy_hitters_err,
    "approx_quantiles_err": q_approx_quantiles_err,
    "hll_err": q_hll_err,
    "kmeans_quality": q_kmeans_quality,
    "dedup_ngram_recall": q_dedup_ngram_recall,
    "dedup_embedding_recall": q_dedup_embedding_recall,
    "semdedup_recall": q_semdedup_recall,
    "quantized_ann_recall": q_quantized_ann_recall,
    "pq_ann_recall": q_pq_ann_recall,
    "ann_ivf_persisted": q_ann_ivf_persisted,
}
