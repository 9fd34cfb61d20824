"""The approximate-operator quality gates (pipelines/quality.py): each
query asserts its algorithm's published error bound internally, so these
tests mostly just run them — a bound violation raises inside the query.
Structural expectations (precision-1.0 pair sets, MG never overcounts)
are re-asserted here on the returned rows."""

import pandas as pd

from fide_crawler_ray.pipelines import quality as QG

SF = "/root/testdata/sf0.001"


def test_minhash_recall_gate():
    out = QG.q_dedup_minhash_recall(SF)
    r = out.iloc[0]
    assert r["precision_x1e6"] == 1_000_000
    assert r["recall_x1e6"] >= 900_000
    assert r["n_hit"] <= min(r["n_exact_pairs"], r["n_lsh_pairs"])


def test_simhash_recall_gate():
    out = QG.q_dedup_simhash_recall(SF)
    r = out.iloc[0]
    assert r["recall_x1e6"] >= 990_000
    assert r["n_docs_sampled"] > 0


def test_heavy_hitters_err_gate():
    out = QG.q_heavy_hitters_err(SF)
    assert len(out) > 0
    assert (out["undercount"] >= 0).all()  # MG never overcounts
    assert (out["est_count"] <= out["true_count"]).all()


def test_approx_quantiles_err_gate():
    out = QG.q_approx_quantiles_err(SF)
    assert list(out["q"]) == ["p50", "p95", "p99"]
    assert (out["rank_err_x1e6"] < 5000).all()


def test_hll_err_gate():
    out = QG.q_hll_err(SF)
    assert out.iloc[0]["scope"] == "global"
    assert len(out) >= 2  # global + at least one group


def test_kmeans_quality_gate():
    out = QG.q_kmeans_quality(SF)
    r = out.iloc[0]
    assert r["obj_trained_x1e6"] >= r["obj_init_x1e6"]
    assert bool(r["improved"])


def test_gates_registered_in_queries():
    # execution is covered per-gate above; here just the registry wiring
    import __ray_entry__ as E

    q = E.queries()
    for name, fn in QG.QUERIES.items():
        assert q.get(name) is fn, name


def test_ngram_recall_gate():
    from fide_crawler_ray.pipelines.quality import q_dedup_ngram_recall

    row = q_dedup_ngram_recall(SF).iloc[0]
    assert row["recall_x1e6"] >= 900_000
    assert row["precision_x1e6"] == 1_000_000


def test_embedding_recall_gate_planted():
    """Multi-table hyperplane LSH must recover ≥80% of planted
    near-duplicates (single-table was ~52% at the 0.98 boundary)."""
    from fide_crawler_ray.pipelines.quality import q_dedup_embedding_recall

    row = q_dedup_embedding_recall(SF).iloc[0]
    assert row["n_true_pairs"] > 0
    assert row["recall_x1e6"] >= 800_000
    assert row["precision_x1e6"] == 1_000_000


def test_semdedup_recall_gate_planted():
    """SemDeDup must drop ≥90% of planted jittered copies and never
    drop a natural vector (natural max cosine ≈ 0.51 ≪ 0.98)."""
    from fide_crawler_ray.pipelines.quality import q_semdedup_recall

    row = q_semdedup_recall(SF).iloc[0]
    assert row["n_planted"] > 0
    assert row["recall_x1e6"] >= 900_000
    assert row["natural_dropped"] == 0


def test_semdedup_without_near_dups_keeps_everything():
    """At the production threshold (0.98, Lloyd path) the natural
    corpus has no near-dups, so SemDeDup is the identity. The
    deterministic driver variant (threshold 0.5) is NOT identity by
    design — its survivors are checked against a driver-side
    brute-force replay of cluster→edges→components instead (it also
    has a full DuckDB oracle)."""
    import numpy as np

    from fide_crawler_ray.functions import ann as ANN
    from fide_crawler_ray.pipelines.queries import (
        T, q_semdedup, q_semdedup_lloyd)

    n = T(SF, "embeddings", ["vec_id"]).count()
    out = q_semdedup_lloyd(SF).to_pandas()
    assert len(out) == n

    # brute-force replay for the 0.5-threshold driver variant
    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy()
    m = ANN._normalize64(np.stack(
        [np.asarray(v, np.float32) for v in emb["embedding"]]))
    ds = T(SF, "embeddings", ["vec_id", "embedding"])
    cents = ANN.md5_sample_centroids(ds, 8, tag="km:42")
    assign = (m @ cents.T).argmax(axis=1)
    import collections
    adj = collections.defaultdict(set)
    for cl in range(8):
        mem = np.where(assign == cl)[0]
        if len(mem) < 2:
            continue
        sub = m[mem] @ m[mem].T
        iu = np.triu_indices(len(mem), 1)
        for h in np.where(sub[iu] >= 0.5)[0]:
            a, b = int(ids[mem[iu[0][h]]]), int(ids[mem[iu[1][h]]])
            adj[a].add(b)
            adj[b].add(a)
    dropped = set()
    for node in adj:
        seen, st = {node}, [node]
        while st:
            u = st.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    st.append(w)
        if min(seen) < node:
            dropped.add(node)
    got = set(q_semdedup(SF).to_pandas()["vec_id"])
    assert got == set(int(i) for i in ids) - dropped


def test_quantized_ann_recall_gate():
    from fide_crawler_ray.pipelines.quality import q_quantized_ann_recall

    row = q_quantized_ann_recall(SF).iloc[0]
    assert row["n_truth"] > 0
    assert row["recall_x1e6"] >= 900_000
