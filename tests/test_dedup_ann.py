"""Dedup pipelines (exact / minhash / simhash / embedding) and ANN search
on crafted fixtures with known duplicates and neighbors."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from fide_crawler_ray.functions import ann as ANN
from fide_crawler_ray.pipelines import dedup_text as DT

BASE = "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill nearby"

SF = "/root/testdata/sf0.001"


def _docs():
    texts = {
        0: BASE,
        1: BASE,                                  # exact dup of 0
        2: BASE.replace("lazy", "sleepy"),        # near dup of 0
        3: "completely different text about databases queries and distributed engines running on clusters",
        4: BASE.replace("dog", "wolf").replace("cat", "bird"),  # near dup
        5: "another unrelated document discussing ray data pipelines and arrow batches at scale",
    }
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))


def test_exact_dedup_keeps_min_doc_id():
    out = DT.exact_dedup(_docs()).to_pandas()
    ids = sorted(out["doc_id"])
    assert 0 in ids and 1 not in ids
    assert len(ids) == 5


def _pairs_set(pairs_ds):
    return {(r["a"], r["b"]) for r in pairs_ds.take_all()}


def test_minhash_lsh_finds_near_dups():
    survivors, pairs = DT.minhash_lsh_dedup(_docs(), threshold=0.5)
    pair_set = _pairs_set(pairs)
    assert (0, 1) in pair_set          # exact dup
    assert (0, 2) in pair_set          # near dup
    ids = sorted(survivors.to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids and 2 not in ids
    assert 3 in ids and 5 in ids


def test_simhash_dedup_drops_exact_and_near():
    survivors, pairs = DT.simhash_dedup(_docs(), max_hamming=10)
    pair_set = _pairs_set(pairs)
    assert (0, 1) in pair_set
    ids = sorted(survivors.to_pandas()["doc_id"])
    assert 0 in ids and 1 not in ids
    assert 3 in ids and 5 in ids


def test_ngram_jaccard_pairs():
    out = DT.ngram_jaccard_pairs(_docs(), [(0, 1), (0, 3)], threshold=0.3).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(0, 1)}
    assert out["jaccard"].iloc[0] == 1.0


def _embeddings(n=60, d=16):
    rng = np.random.default_rng(3)
    m = rng.standard_normal((n, d)).astype(np.float32)
    m[1] = m[0]                     # exact dup pair
    m[2] = m[0] + 0.01 * rng.standard_normal(d).astype(np.float32)  # near
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m],
                              pa.list_(pa.float32())),
    })), m


def test_embedding_cosine_dedup():
    ds, _ = _embeddings()
    survivors, pairs = DT.embedding_cosine_dedup(ds, threshold=0.99, dim=16)
    ids = set(survivors.to_pandas()["vec_id"])
    assert 0 in ids and 1 not in ids
    assert (0, 1) in _pairs_set(pairs)


def test_brute_force_topk_matches_numpy():
    ds, m = _embeddings()
    q = m[:3]
    out = ANN.brute_force_topk(ds, q, k=5).to_pandas()
    md = m.astype(np.float64)
    md = md / np.linalg.norm(md, axis=1, keepdims=True)
    qd = md[:3]
    sims = md @ qd.T
    for j in range(3):
        expect = list(np.argsort(-sims[:, j], kind="stable")[:5])
        got = out[out["query_id"] == j].sort_values("rank")["vec_id"].tolist()
        assert got == expect
    assert (out[out["rank"] == 1]["score"] == 1.0).all()


def test_ivf_search_recall_vs_brute():
    ds, m = _embeddings(n=120, d=16)
    q = m[:4]
    brute = ANN.brute_force_topk(ds, q, k=5).to_pandas()
    cents = ANN.sample_centroids(ds, n_centroids=8)
    ivf = ANN.ivf_search(ds, cents, q, k=5, nprobe=4).to_pandas()
    # recall@5 ≥ 0.5 with half the buckets probed
    hits = total = 0
    for j in range(4):
        b = set(brute[brute["query_id"] == j]["vec_id"])
        i = set(ivf[ivf["query_id"] == j]["vec_id"])
        hits += len(b & i)
        total += len(b)
    assert hits / total >= 0.5
    # the query vector (or an exact dup of it — vec 1 == vec 0) ranks 1st
    for j in range(4):
        top = ivf[(ivf["query_id"] == j) & (ivf["rank"] == 1)]
        assert top["score"].iloc[0] == 1.0
    assert ivf[(ivf["query_id"] == 3) & (ivf["rank"] == 1)]["vec_id"].iloc[0] == 3


def test_embedding_kmeans_objective_improves():
    """Lloyd iterations can only raise the spherical k-means objective
    (total member→centroid cosine); cluster sizes must sum to the
    corpus and every cluster mean must be a valid cosine."""
    from fide_crawler_ray.pipelines.queries import q_embedding_kmeans_lloyd

    import pyarrow.parquet as pq

    n_vecs = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    base = q_embedding_kmeans_lloyd(SF, iters=0).to_pandas()
    out = q_embedding_kmeans_lloyd(SF, iters=5).to_pandas()
    assert int(out["n"].sum()) == n_vecs
    assert int(base["n"].sum()) == n_vecs
    obj0 = (base["n"] * base["mean_sim_fp"]).sum()
    obj5 = (out["n"] * out["mean_sim_fp"]).sum()
    assert obj5 >= obj0 - 1e3  # fixed-point truncation slack
    assert out["mean_sim_fp"].between(-1_000_000, 1_000_000).all()


def test_hard_negatives_exclude_label_and_match_bruteforce():
    """Every returned hard negative has a different label than its
    query, and the result equals a driver-side numpy brute force."""
    from fide_crawler_ray.pipelines.queries import (
        T, q_hard_negatives, to_df_any)

    out = to_df_any(q_hard_negatives(SF))
    emb = T(SF, "embeddings", ["vec_id", "embedding", "label"]).to_pandas()
    labels = emb.set_index("vec_id")["label"]
    vecs = np.stack([np.asarray(v, dtype=np.float32)
                     for v in emb["embedding"]]).astype(np.float64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    for qid in sorted(out["query_id"].unique()):
        ql = labels.loc[qid]
        got = out[out["query_id"] == qid].sort_values("rank")
        assert (got["vec_id"].map(labels) != ql).all()
        qv = vecs[ids == qid][0]
        sims = vecs @ qv
        mask = labels.reindex(ids).to_numpy() != ql
        order = sorted(zip(-sims[mask], ids[mask]))
        exp_ids = [int(i) for _, i in order[:10]]
        assert got["vec_id"].tolist() == exp_ids


def test_mmr_rerank_matches_scalar_spec():
    """The MMR selection equals a pure-python greedy re-implementation
    of the integer fixed-point spec (rel12 = round(score·1e4)·1e8,
    sim_int = dot of round_half_away(v̂·1e6), obj = 7·rel12 − 3·max
    sim-to-chosen, vec_id tie-break), the first pick per query is the
    relevance argmax, and no vec is picked twice."""
    import numpy as np
    import pandas as pd

    from fide_crawler_ray.functions import ann as ANN
    from fide_crawler_ray.pipelines.queries import (
        T, _queries_matrix, q_mmr_rerank)

    SF = "/root/testdata/sf0.001"
    got = q_mmr_rerank(SF)
    assert not got.duplicated(["query_id", "vec_id"]).any()

    emb = T(SF, "embeddings", ["vec_id", "embedding"])
    cands = ANN.brute_force_topk(
        emb, _queries_matrix(SF), k=50, precise=True).to_pandas()

    def _rha(x):
        return int(np.sign(x) * np.floor(np.abs(x) + 0.5))

    ufp = {}
    for _, r in emb.to_pandas().iterrows():
        v = np.asarray(r["embedding"], np.float64)
        v = v / max(np.linalg.norm(v), 1e-12)
        ufp[int(r["vec_id"])] = np.array([_rha(x * 1e6) for x in v],
                                         dtype=np.int64)
    for qid, g in cands.groupby("query_id"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True])
        ids = g["vec_id"].tolist()
        rel12 = {int(i): _rha(s * 1e4) * 10**8
                 for i, s in zip(g["vec_id"], g["score"])}
        chosen = []
        for rank in range(1, 11):
            best, best_obj = None, None
            for i in ids:
                if i in chosen:
                    continue
                div = max((int(ufp[i] @ ufp[j]) for j in chosen),
                          default=0)
                obj = 7 * rel12[i] - 3 * div  # exact ints
                if best is None or obj > best_obj or (
                        obj == best_obj and i < best):
                    best, best_obj = i, obj
            chosen.append(best)
            row = got[(got["query_id"] == qid) & (got["rank"] == rank)]
            assert int(row["vec_id"].iloc[0]) == best, (qid, rank)
            assert int(row["mmr_fp"].iloc[0]) == best_obj, (qid, rank)
        # first pick is the top-relevance vec
        assert chosen[0] == ids[0]


def test_deterministic_oracle_decision_margins():
    """The r5 hard oracles (ann_ivf / embedding_kmeans / semdedup / mmr)
    rely on decision margins dwarfing the ≤2.4e-7 cross-engine cosine
    error (DOUBLE[] casts bring it to ~1e-15, but the bound must hold
    even on the FLOAT path). The margins were measured once when the
    oracles were designed — this test makes them EXECUTABLE so a driver
    testdata regeneration (new seeds → new geometry) that parks a
    vector near a decision boundary fails loudly here instead of
    surfacing as an inexplicable oracle mismatch."""
    import numpy as np

    from fide_crawler_ray.functions import ann as ANN
    from fide_crawler_ray.pipelines.queries import T

    FLOOR = 1e-4  # > 400x the float-path cross-engine error

    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    m = ANN._normalize64(np.stack(
        [np.asarray(v, np.float32) for v in emb["embedding"]]))
    ds = T(SF, "embeddings", ["vec_id", "embedding"])

    # IVF (16 md5 centroids): assignment + probe-set boundaries
    c16 = ANN.md5_sample_centroids(ds, 16, tag="ivf:42")
    sims = m @ c16.T
    top2 = np.sort(sims, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0]).min() > FLOOR, "ivf assignment"
    qsim = m[:5] @ c16.T
    srt = np.sort(qsim, axis=1)[:, ::-1]
    assert (srt[:, 7] - srt[:, 8]).min() > FLOOR, "ivf probe nprobe=8"

    # k-means / semdedup (8 md5 centroids): assignment + 0.5 threshold
    c8 = ANN.md5_sample_centroids(ds, 8, tag="km:42")
    sims8 = m @ c8.T
    top2 = np.sort(sims8, axis=1)[:, -2:]
    assert (top2[:, 1] - top2[:, 0]).min() > FLOOR, "kmeans assignment"
    assign = sims8.argmax(axis=1)
    worst = 1.0
    for cl in range(8):
        mem = np.where(assign == cl)[0]
        if len(mem) < 2:
            continue
        sub = m[mem] @ m[mem].T
        iu = np.triu_indices(len(mem), 1)
        if len(iu[0]):
            worst = min(worst, np.abs(sub[iu] - 0.5).min())
    assert worst > FLOOR, "semdedup 0.5-threshold margin"

    # brute-force pool (mmr/ivf scoring): rank-50 boundary + distance
    # of every pool score to its round-4 boundary
    allsim = m[:5] @ m.T
    for qi in range(5):
        o = sorted(range(len(ids)), key=lambda i: (-allsim[qi][i], ids[i]))
        assert allsim[qi][o[49]] - allsim[qi][o[50]] > FLOOR, "rank50"
        pool = allsim[qi][o[:50]]
        frac = np.abs(pool * 1e4 - np.floor(pool * 1e4) - 0.5)
        # measured min 7.85e-4 at sf0.001; errors are <=2.4e-7
        assert frac.min() > 1e-4, "round-4 boundary"
