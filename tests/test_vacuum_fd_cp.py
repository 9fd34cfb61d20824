"""Batch-2 session operators: store VACUUM (base-epoch protocol),
Frequent-Directions sketch, DAG critical path, linkage-quality audit.
Oracle parity is the driver gate's job; these tests pin the vacuum
crash-consistency contract, the FD guarantee + mergeability on raw
numpy, and brute-force replays at sf0.001."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T
from fide_crawler_ray.sources import store as S

SF = "/root/testdata/sf0.001"


def _mk_store(tmp_path, n_epochs=4):
    root = str(tmp_path / "store")
    for ep in range(n_epochs):
        t = pa.table({
            "k": pa.array(range(ep * 10, ep * 10 + 10), pa.int64()),
            "ep": pa.array([ep] * 10, pa.int64()),
        })
        S.write_epoch(rd.from_arrow(t), root, "tbl", ep)
    return root


def _view(root, **kw):
    ds = S.read_all(root, "tbl", **kw)
    return (ds.to_pandas().sort_values("k").reset_index(drop=True)
            if ds is not None else None)


def test_vacuum_preserves_rows_and_removes_epochs(tmp_path):
    root = _mk_store(tmp_path)
    before = _view(root)
    res = S.vacuum(root, "tbl", 2)
    assert res["base"] == 2 and res["removed"] == 3
    pd.testing.assert_frame_equal(_view(root), before)
    dirs = sorted(os.listdir(os.path.join(root, "tbl")))
    assert "base=00002" in dirs
    assert not any(d.startswith("epoch=") and int(d.split("=")[1]) <= 2
                   for d in dirs)
    assert "epoch=00003" in dirs


def test_vacuum_crash_window_never_double_counts(tmp_path):
    root = _mk_store(tmp_path)
    before = _view(root)
    # simulate a crash AFTER the base rename, BEFORE any delete: build
    # the base exactly as vacuum would, leave every old epoch in place
    sub = S.read_all(root, "tbl", max_epoch=2)
    tmp = os.path.join(root, "tbl", "base=00002.tmp")
    sub.write_parquet(tmp)
    os.rename(tmp, os.path.join(root, "tbl", "base=00002"))
    # readers must see the SAME table (stragglers are inert)
    pd.testing.assert_frame_equal(_view(root), before)
    # re-running vacuum is idempotent and cleans the stragglers
    res = S.vacuum(root, "tbl", 2)
    assert res["removed"] == 3
    pd.testing.assert_frame_equal(_view(root), before)


def test_vacuum_time_travel_contract(tmp_path):
    root = _mk_store(tmp_path)
    S.vacuum(root, "tbl", 2)
    with pytest.raises(ValueError, match="vacuumed"):
        S.read_all(root, "tbl", max_epoch=1)
    after = _view(root, max_epoch=3)
    assert set(after["ep"]) == {0, 1, 2, 3}


def test_vacuum_again_supersedes_old_base(tmp_path):
    root = _mk_store(tmp_path)
    before = _view(root)
    S.vacuum(root, "tbl", 1)
    S.vacuum(root, "tbl", 2)
    pd.testing.assert_frame_equal(_view(root), before)
    dirs = sorted(os.listdir(os.path.join(root, "tbl")))
    assert "base=00002" in dirs and "base=00001" not in dirs


def test_fd_shrink_guarantee_and_mergeability():
    rng = np.random.RandomState(11)
    ell, d = 8, 16
    a1 = rng.randn(100, d)
    a2 = rng.randn(137, d)
    a = np.vstack([a1, a2])

    def err(A, B):
        return np.abs(np.linalg.eigvalsh(A.T @ A - B.T @ B)).max()

    bound = (a * a).sum() / ell
    # streaming guarantee on one shrink chain
    b = R._fd_shrink(np.vstack([R._fd_shrink(a1, ell), a2]), ell)
    assert err(a, b) <= bound * (1 + 1e-9)
    # mergeability: shrink of stacked per-part sketches
    bm = R._fd_shrink(np.vstack([R._fd_shrink(a1, ell),
                                 R._fd_shrink(a2, ell)]), ell)
    assert err(a, bm) <= bound * (1 + 1e-9)


def test_frequent_directions_query_gates_itself():
    got = R.q_frequent_directions(SF).to_pandas()
    emb = T(SF, "embeddings", ["embedding"]).to_pandas()
    assert got.shape[0] == 1
    assert int(got["n_rows"].iloc[0]) == len(emb)
    assert bool(got["ok"].iloc[0])
    assert float(got["spectral_err"].iloc[0]) <= float(got["bound"].iloc[0])


def test_dag_critical_path_brute_force():
    got = (R.q_dag_critical_path(SF).to_pandas()
           .sort_values("node").reset_index(drop=True))
    n = len(T(SF, "customer", ["c_custkey"]).to_pandas())
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    k = o["o_orderkey"].to_numpy().astype(np.int64)
    src = o["o_custkey"].to_numpy().astype(np.int64)
    dst = k % n
    w = (k // n) % 9 + 1
    m = src < dst
    src, dst, w = src[m], dst[m], w[m]
    pack = np.arange(n, dtype=np.int64)          # dist 0, pred = self
    for _ in range(R.CP_ROUNDS):
        new = pack.copy()
        cand = (pack[src] // n + w) * n + src
        np.maximum.at(new, dst, cand)
        pack = new
    exp = pd.DataFrame({"node": np.arange(n, dtype=np.int64),
                        "dist": pack // n, "pred": pack % n})
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # path reconstruction is consistent: pred(v) != v implies the edge
    # pred->v exists and v was actually reached (dist >= min weight 1).
    # NOTE dist(v) >= dist(pred)+1 need NOT hold under a bounded round
    # budget: pred's own K-round dist may exceed its value at the round
    # v last improved.
    has_edge = set(zip(src.tolist(), dst.tolist()))
    for _, r in exp[exp["pred"] != exp["node"]].iterrows():
        assert (int(r["pred"]), int(r["node"])) in has_edge
        assert r["dist"] >= 1


def test_linkage_quality_brute_force():
    got = R.q_linkage_quality(SF)
    c = T(SF, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    s = T(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    x = c.merge(s, how="cross")
    blocked = x["c_nationkey"] == x["s_nationkey"]
    truth = x["c_custkey"] % 100 == x["s_suppkey"] % 100
    cand, tru, tb = int(blocked.sum()), int(truth.sum()), \
        int((blocked & truth).sum())
    cross = len(c) * len(s)
    assert int(got["n_candidates"].iloc[0]) == cand
    assert int(got["n_truth"].iloc[0]) == tru
    assert int(got["n_truth_blocked"].iloc[0]) == tb
    assert int(got["reduction_ratio_fp"].iloc[0]) == \
        (cross - cand) * 10**9 // max(cross, 1)
    assert int(got["completeness_fp"].iloc[0]) == \
        tb * 10**9 // max(tru, 1)


def test_vacuum_store_query_audit():
    got = R.q_vacuum_store(SF)
    docs = T(SF, "documents", ["doc_id", "n_chars"]).to_pandas()
    assert int(got["n_rows"].iloc[0]) == len(docs)
    assert int(got["id_sum"].iloc[0]) == int(docs["doc_id"].sum())
    assert bool(got["vacuumed"].iloc[0])


def test_dp_histogram_mechanism_replay():
    import hashlib
    import math

    got = (R.q_dp_histogram(SF).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    ev = T(SF, "events", ["event_type"]).to_pandas()
    cnt = ev.groupby("event_type").size()

    def geo(tag, t):
        u = int(hashlib.md5(f"{tag}:{t}".encode())
                .hexdigest()[:15], 16) / 2.0 ** 60
        return int(math.floor(-math.log(1.0 - u)))

    for _, r in got.iterrows():
        t = r["event_type"]
        assert r["n_true"] == cnt[t]
        assert r["n_dp"] == cnt[t] + geo("dp1", t) - geo("dp2", t)


def test_merkle_partition_diff_pins_touched_partitions():
    import hashlib

    got = (R.q_merkle_partition_diff(SF).to_pandas()
           .sort_values("part").reset_index(drop=True))
    docs = T(SF, "documents", ["doc_id", "n_chars"]).to_pandas()
    did = docs["doc_id"].to_numpy().astype(np.int64)
    # ground truth: a partition differs iff it contains a dropped or a
    # modified row
    touched = set((did[(did % 97 == 13) | (did % 101 == 7)]
                   % R.MERKLE_PARTS).tolist())
    assert set(got.loc[got["differs"], "part"]) == touched
    # digest replay for replica A
    h = np.array([int(hashlib.md5(f"{d}:{c}".encode()).hexdigest()[:15],
                      16) for d, c in zip(did, docs["n_chars"])], np.int64)
    for p in range(R.MERKLE_PARTS):
        m = did % R.MERKLE_PARTS == p
        exp = (np.bitwise_xor.reduce(h[m]) if m.any() else -1)
        row = got[got["part"] == p]
        if len(row):
            assert int(row["hash_a"].iloc[0]) == int(exp)


def test_feature_hashing_brute_force():
    import hashlib
    from collections import Counter

    got = R.q_feature_hashing(SF).to_pandas()
    docs = T(SF, "documents", ["text"]).to_pandas()
    vocab = Counter()
    for txt in docs["text"]:
        vocab.update(R._TOKEN.findall(txt.lower()))
    buckets = Counter()
    mass = Counter()
    for t, n in vocab.items():
        bk = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % \
            R.FH_BUCKETS
        buckets[bk] += 1
        mass[bk] += n
    shared = {b for b, c in buckets.items() if c > 1}
    assert int(got["n_tokens"].iloc[0]) == len(vocab)
    assert int(got["n_buckets_used"].iloc[0]) == len(buckets)
    assert int(got["max_bucket_load"].iloc[0]) == max(buckets.values())
    assert int(got["n_collided_tokens"].iloc[0]) == \
        sum(buckets[b] for b in shared)
    assert int(got["collision_mass_fp"].iloc[0]) == \
        sum(mass[b] for b in shared) * 10**9 // sum(mass.values())


def test_fairness_audit_brute_force():
    got = (R.q_fairness_audit(SF).to_pandas()
           .sort_values("grp").reset_index(drop=True))
    o = T(SF, "orders",
          ["o_custkey", "o_totalprice", "o_orderstatus"]).to_pandas()
    c = T(SF, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    x = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    y = (x["o_orderstatus"] == "F").astype(int)
    yh = (x["o_totalprice"] > R.FAIR_PRICE_THRESHOLD).astype(int)
    e9 = 10**9
    for _, r in got.iterrows():
        m = x["c_mktsegment"] == r["grp"]
        n, ny = int(m.sum()), int(y[m].sum())
        assert r["n"] == n
        assert r["pos_rate_fp"] == int(yh[m].sum()) * e9 // n
        assert r["base_rate_fp"] == ny * e9 // n
        assert r["tpr_fp"] == int((y[m] * yh[m]).sum()) * e9 // max(ny, 1)
        assert r["fpr_fp"] == \
            int(((1 - y[m]) * yh[m]).sum()) * e9 // max(n - ny, 1)


def test_qini_uplift_brute_force():
    import hashlib

    got = (R.q_qini_uplift(SF).to_pandas()
           .sort_values("decile", ascending=False).reset_index(drop=True))
    ev = T(SF, "events", ["user_id", "value"]).to_pandas()
    uid = ev["user_id"].to_numpy().astype(np.int64)
    dec = np.array([int(hashlib.md5(f"uplift:{u}".encode())
                        .hexdigest()[:15], 16) % 10 for u in uid])
    t = (uid % 2 == 0).astype(int)
    y = (ev["value"].to_numpy() > 0).astype(int)
    e9 = 10**9
    cnt = cyt = cnc = cyc = 0
    for i, d in enumerate(sorted(set(dec.tolist()), reverse=True)):
        m = dec == d
        cnt += int(t[m].sum()); cyt += int((t * y)[m].sum())
        cnc += int(((1 - t))[m].sum()); cyc += int(((1 - t) * y)[m].sum())
        r = got.iloc[i]
        assert r["decile"] == d and r["cum_nt"] == cnt
        assert r["cum_yt"] == cyt and r["cum_nc"] == cnc
        assert r["cum_yc"] == cyc
        assert r["uplift_fp"] == \
            cyt * e9 // max(cnt, 1) - cyc * e9 // max(cnc, 1)


def _luby_graph():
    n = len(T(SF, "customer", ["c_custkey"]).to_pandas())
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    s = o["o_custkey"].to_numpy().astype(np.int64)
    d = (o["o_orderkey"].to_numpy().astype(np.int64)) % n
    m = s != d
    edges = set(map(tuple, np.stack(
        [np.minimum(s[m], d[m]), np.maximum(s[m], d[m])], 1).tolist()))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    return n, adj


def test_luby_mis_invariants_and_replay():
    got = R.q_luby_mis(SF).to_pandas().set_index("node").sort_index()
    n, adj = _luby_graph()
    assert len(got) == n
    mis = set(got.index[got["status"] == 1])
    # independence: no two MIS nodes are adjacent
    for u in mis:
        assert not (adj.get(u, set()) & mis)
    # every decided non-MIS node has an MIS neighbor (it was removed
    # because a neighbor won)
    for u in got.index[got["status"] == 2]:
        assert adj.get(u, set()) & mis
    # sequential replay of Luby rounds
    und = set(range(n))
    status = {v: (0, 0) for v in und}
    for r in range(1, R.LUBY_ROUNDS + 1):
        q = {v: R._luby_q(np.array([v]), r)[0] for v in und}
        win = {v for v in und
               if all(q[v] > q[u] for u in adj.get(v, set()) & und)}
        rem = set()
        for w in win:
            rem |= adj.get(w, set()) & und
        rem -= win
        for v in win:
            status[v] = (1, r)
        for v in rem:
            status[v] = (2, r)
        und -= win | rem
    for v, (st, rd) in status.items():
        assert got.loc[v, "status"] == st
        assert got.loc[v, "decided_round"] == rd


def test_negative_sampling_brute_force():
    import hashlib
    from collections import Counter

    got = (R.q_negative_sampling(SF).to_pandas()
           .sort_values(["doc_id", "j"]).reset_index(drop=True))
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    vocab = Counter()
    for txt in docs["text"]:
        vocab.update(R._TOKEN.findall(txt.lower()))
    terms = sorted(vocab)
    n = np.array([vocab[t] for t in terms], np.int64)
    lo = np.concatenate([[0], np.cumsum(n)[:-1]])
    total = int(n.sum())
    assert len(got) == len(docs) * R.NEG_SAMPLES_K
    for _, r in got.head(100).iterrows():
        u = int(hashlib.md5(
            f"neg:{int(r['doc_id'])}:{int(r['j'])}".encode())
            .hexdigest()[:15], 16)
        rk = (u * total) >> 60
        i = int(np.searchsorted(lo, rk, side="right")) - 1
        assert r["neg_term"] == terms[i]
    # draws follow the unigram distribution's support
    assert set(got["neg_term"]) <= set(terms)


def test_delta_join_view_consistent_and_exact():
    got = (R.q_delta_join_view(SF).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    o = T(SF, "orders",
          ["o_orderkey", "o_custkey", "o_totalprice"]).to_pandas()
    c = T(SF, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    x = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    x["cents"] = R._round_half_away(
        x["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    exp = (x.groupby("c_mktsegment")
            .agg(n_orders=("cents", "size"), rev_fp=("cents", "sum"))
            .reset_index())
    assert bool(got["consistent"].all())
    pd.testing.assert_frame_equal(
        got[["c_mktsegment", "n_orders", "rev_fp"]], exp,
        check_dtype=False)
    # the delta split is non-trivial (both sides populated)
    assert (o["o_orderkey"] % 23 == 3).any()
    assert (o["o_orderkey"] % 23 != 3).any()


def test_ddsketch_guarantee_brute_force():
    got = R.q_ddsketch_quantiles(SF).to_pandas()
    o = T(SF, "orders", ["o_totalprice"]).to_pandas()
    cents = np.sort(R._round_half_away(
        o["o_totalprice"].to_numpy() * 100.0).astype(np.int64))
    assert bool(got["ok"].all())
    for _, r in got.iterrows():
        rank = (len(cents) - 1) * int(r["q_mille"]) // 1000
        exact = int(cents[rank])
        assert int(r["exact_cents"]) == exact
        assert abs(float(r["est"]) - exact) <= R.DD_ALPHA * exact * 1.001


def test_ktruss_brute_force():
    got = (R.q_ktruss(SF).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    n, adj = _luby_graph()
    edges = {(u, v) for u in adj for v in adj[u] if u < v}

    def supports(es):
        nb = {}
        for u, v in es:
            nb.setdefault(u, set()).add(v)
            nb.setdefault(v, set()).add(u)
        return {(u, v): len(nb.get(u, set()) & nb.get(v, set()))
                for u, v in es}

    es = set(edges)
    for _ in range(R.KTRUSS_ROUNDS):
        sup = supports(es)
        es = {e for e in es if sup[e] >= R.KTRUSS_K - 2}
    sup = supports(es)
    exp = pd.DataFrame(
        sorted((u, v, sup[(u, v)]) for u, v in es),
        columns=["u", "v", "support"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # cohesion invariant: every surviving edge had >= k-2 triangles at
    # the moment of the last peel (subset of the (k-1)-core edge set)
    assert (exp["support"] >= 0).all()


def test_coordinated_sample_join_brute_force():
    import hashlib

    got = R.q_coordinated_sample_join(SF).to_pandas()
    o = T(SF, "orders", ["o_orderkey"]).to_pandas()
    li = T(SF, "lineitem", ["l_orderkey"]).to_pandas()
    on = o.groupby("o_orderkey").size()
    ln = li.groupby("l_orderkey").size()
    common = on.index.intersection(ln.index)
    prod = (on[common] * ln[common])
    keep = np.array([
        int(hashlib.md5(f"coord:{int(k)}".encode()).hexdigest()[:15], 16)
        % 100 < R.COORD_PCT for k in common])
    exact, sampled = int(prod.sum()), int(prod[keep].sum())
    est = sampled * 100 // R.COORD_PCT
    assert int(got["n_join_exact"].iloc[0]) == exact
    assert int(got["n_join_sampled"].iloc[0]) == sampled
    assert int(got["ht_estimate"].iloc[0]) == est
    assert int(got["keys_kept"].iloc[0]) == int(keep.sum())
    assert int(got["rel_err_fp"].iloc[0]) == \
        abs(est - exact) * 10**9 // max(exact, 1)
    # the HT estimate should be in the right ballpark (coordinated
    # keeps whole key strata; 10% of ~1500 keys is a real sample)
    assert est > 0
