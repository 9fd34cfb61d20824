"""Late-round-3 operators: deterministic random walks, length-2
betweenness, keep-first span dedup, curriculum interleaving, growth
accounting, token-dropout augmentation. DuckDB parity is covered by the
oracle gate (tools/check_oracles.py); these tests pin the structural
invariants and replay a brute-force reference the SQL can't express
directly (e.g. walk transitions really follow edges, credits conserve
across the pair decomposition)."""

import hashlib

import numpy as np
import pandas as pd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines import textclean as TC
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


def _undirected_edges() -> tuple[np.ndarray, np.ndarray, int]:
    n = T(SF, "customer", ["c_custkey"]).count()
    e = R._pagerank_edges(SF, n).to_pandas()
    s = e["src"].to_numpy(np.int64)
    d = e["dst"].to_numpy(np.int64)
    keep = s != d
    u = np.minimum(s[keep], d[keep])
    v = np.maximum(s[keep], d[keep])
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return uv[:, 0], uv[:, 1], n


def test_betweenness_len2_matches_brute_force():
    u, v, n = _undirected_edges()
    adj = np.zeros((n, n), dtype=np.int64)
    adj[u, v] = 1
    adj[v, u] = 1
    cn = adj @ adj  # common-neighbor counts
    expect_credit = np.zeros(n, dtype=np.int64)
    expect_pairs = np.zeros(n, dtype=np.int64)
    for s in range(n):
        for t in range(s + 1, n):
            c = cn[s, t]
            if c == 0 or adj[s, t]:
                continue
            mids = np.nonzero(adj[s] & adj[t])[0]
            expect_credit[mids] += 10**9 // c
            expect_pairs[mids] += 1
    got = R.q_betweenness_len2(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    nodes = got["node"].to_numpy(np.int64)
    assert (expect_pairs[nodes] == got["n_pairs"].to_numpy()).all()
    assert (expect_credit[nodes] == got["bw2_fp"].to_numpy()).all()
    # nodes absent from the output earned zero credit
    absent = np.setdiff1d(np.arange(n), nodes)
    assert (expect_pairs[absent] == 0).all()


def test_random_walks_follow_edges_and_replay_md5():
    u, v, n = _undirected_edges()
    nbrs: dict[int, np.ndarray] = {}
    for a, b in zip(u.tolist(), v.tolist()):
        nbrs.setdefault(a, []).append(b)  # type: ignore[arg-type]
        nbrs.setdefault(b, []).append(a)  # type: ignore[arg-type]
    nbrs = {k: np.unique(np.asarray(s)) for k, s in nbrs.items()}

    out = R.q_graph_random_walks(SF).to_pandas()
    walks = out.pivot(index="walk_id", columns="step", values="node")
    assert list(walks.columns) == list(range(R.RW_STEPS + 1))
    assert walks.notna().all().all()  # no walk dies (deg >= 1 holds)
    # start set: exactly the touched nodes = 0 (mod 7)
    touched = np.unique(np.concatenate([u, v]))
    starts = set(touched[touched % R.RW_START_MOD == 0].tolist())
    assert set(walks.index) == starts
    assert (walks[0].to_numpy(np.int64)
            == walks.index.to_numpy(np.int64)).all()
    for wid, row in walks.iterrows():
        for t in range(1, R.RW_STEPS + 1):
            cur, nxt = int(row[t - 1]), int(row[t])
            cand = nbrs[cur]
            r = int(hashlib.md5(f"{wid}|{t}|{cur}".encode())
                    .hexdigest()[:15], 16) % len(cand)
            assert nxt == int(cand[r])


def test_span_keep_first_conserves_distinct_spans():
    w = TC.SPAN_KF_W
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    first_pos: dict[str, tuple] = {}
    n_spans: dict[int, int] = {}
    spans_by_doc: dict[int, list] = {}
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        sp = [" ".join(toks[i:i + w]) for i in range(0, len(toks), w)]
        n_spans[row["doc_id"]] = len(sp)
        spans_by_doc[row["doc_id"]] = sp
        for o, s in enumerate(sp):
            first_pos.setdefault(s, (row["doc_id"], o))
    got = TC.q_span_keep_first(SF).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (got["n_kept"] <= got["n_spans"]).all()
    assert int(got["n_kept"].sum()) == len(first_pos)
    for doc_id in docs["doc_id"].head(20):
        kept = [s for o, s in enumerate(spans_by_doc[doc_id])
                if first_pos[s] == (doc_id, o)]
        clean = " ".join(kept)
        fp = int(hashlib.md5(clean.encode()).hexdigest()[:15], 16)
        assert got.loc[doc_id, "n_spans"] == n_spans[doc_id]
        assert got.loc[doc_id, "n_kept"] == len(kept)
        assert got.loc[doc_id, "clean_fp"] == fp


def test_interleave_curriculum_is_a_balanced_prefix_order():
    got = TC.q_interleave_curriculum(SF).to_pandas()
    assert got["pos"].is_unique
    assert (got["pos"].to_numpy() == np.sort(got["pos"].to_numpy())).all()
    docs = T(SF, "documents", ["doc_id", "source", "n_chars"]).to_pandas()
    assert len(got) == len(docs)
    for src, g in got.groupby("source"):
        assert sorted(g["r"]) == list(range(1, len(g) + 1))
        m = docs[docs["source"] == src].set_index("doc_id")
        ordered = g.sort_values("r")
        ch = m.loc[ordered["doc_id"], "n_chars"].to_numpy()
        assert (ch[:-1] >= ch[1:]).all()  # quality-descending
    # any prefix of length k*n_sources contains exactly k per source
    nsrc = got["source"].nunique()
    sizes = got.groupby("source").size()
    k = int(sizes.min())
    prefix = got.sort_values("pos").head(k * nsrc)
    assert (prefix.groupby("source").size() == k).all()


def test_growth_accounting_flow_conservation():
    got = R.q_growth_accounting(SF).to_pandas() \
        .set_index("day_idx").sort_index()
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    ev["d"] = (ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")) \
        // pd.Timedelta("1D")
    active = ev.groupby("d")["user_id"].nunique()
    for d in got.index:
        row = got.loc[d]
        assert row["n_new"] + row["n_retained"] + row["n_resurrected"] \
            == active.get(d, 0)
        if d - 1 in active.index:
            assert row["n_churned"] == active[d - 1] - row["n_retained"]
    # every user is new exactly once
    assert int(got["n_new"].sum()) == ev["user_id"].nunique()


def test_token_dropout_replays_gate():
    got = TC.q_token_dropout_aug(SF).to_pandas() \
        .set_index("doc_id").sort_index()
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    assert (got["n_kept"] <= got["n_tokens"]).all()
    drop_share = 1 - got["n_kept"].sum() / got["n_tokens"].sum()
    assert 0.03 < drop_share < 0.10  # p = 1/16 with slack
    for _, row in docs.head(20).iterrows():
        toks = row["text"].split(" ")
        kept = [t for i, t in enumerate(toks)
                if hashlib.md5(f"{row['doc_id']}|{i}".encode())
                .hexdigest()[0] != "0"]
        fp = int(hashlib.md5(" ".join(kept).encode())
                 .hexdigest()[:15], 16)
        assert got.loc[row["doc_id"], "n_kept"] == len(kept)
        assert got.loc[row["doc_id"], "aug_fp"] == fp


def test_pagerank_checkpoint_resume_is_bit_identical():
    """A kill after iteration 4 (checkpoint at 3) + resume must equal
    both the uninterrupted checkpointed run and q_pagerank itself."""
    import shutil
    import tempfile

    expect = R.q_pagerank(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)

    out = tempfile.mkdtemp(prefix="fcray_prckpt_test_")
    try:
        assert R.run_pagerank_checkpointed(SF, out, stop_after_iter=4) \
            is None
        from fide_crawler_ray.sources import store
        assert store.load_manifest(out)["done_iter"] == 3
        got = R.run_pagerank_checkpointed(SF, out).to_pandas() \
            .sort_values("node").reset_index(drop=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    pd.testing.assert_frame_equal(got, expect)


def test_pagerank_checkpoint_noop_when_complete():
    """Re-invoking a finished run resumes from the final checkpoint and
    performs zero further iterations (manifest watermark respected)."""
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="fcray_prckpt_test2_")
    try:
        # iters=2/every=1 keeps the watermark/no-op semantics under test
        # while halving the join-tier iterations (the resume-equivalence
        # test above covers the full default-iters path)
        first = R.run_pagerank_checkpointed(SF, out, iters=2, every=1) \
            .to_pandas().sort_values("node").reset_index(drop=True)
        again = R.run_pagerank_checkpointed(SF, out, iters=2, every=1) \
            .to_pandas().sort_values("node").reset_index(drop=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    pd.testing.assert_frame_equal(again, first)


def test_span_keep_first_tiers_pinned_equal():
    """The dup-only broadcast probe tier and the guarded join tier must
    emit identical rows (max_broadcast_dups=0 forces the join plan)."""
    probe = TC.q_span_keep_first(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    join = TC.q_span_keep_first(SF, max_broadcast_dups=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(probe, join)
