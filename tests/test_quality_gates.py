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
    """On the natural corpus (no near-dups) SemDeDup is the identity."""
    from fide_crawler_ray.pipelines.queries import T, q_semdedup

    out = q_semdedup(SF).to_pandas()
    n = T(SF, "embeddings", ["vec_id"]).count()
    assert len(out) == n


def test_quantized_ann_recall_gate():
    from fide_crawler_ray.pipelines.quality import q_quantized_ann_recall

    row = q_quantized_ann_recall(SF).iloc[0]
    assert row["n_truth"] > 0
    assert row["recall_x1e6"] >= 900_000
