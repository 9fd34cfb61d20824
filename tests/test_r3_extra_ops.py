"""Round-3 extension operators (batch A): temporal reachability, Katz
centrality, inclusion-dependency discovery. DuckDB parity is covered by
the oracle gate (tools/check_oracles.py); these tests replay a
brute-force reference over the sf0.001 derived graphs/columns and pin
structural invariants the SQL comparison can't see."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


def _orders():
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_orderdate"])
    n = T(SF, "customer", ["c_custkey"]).count()
    k = t["o_orderkey"].to_numpy()
    c = t["o_custkey"].to_numpy()
    ts = t["o_orderdate"].to_numpy().astype("datetime64[us]").view("int64")
    return c.astype(np.int64), (k % n).astype(np.int64), ts, n


def test_temporal_reachability_matches_brute_force():
    src, dst, t, n = _orders()
    INF = np.iinfo(np.int64).max
    ea = np.full(n, INF, dtype=np.int64)
    ea[0] = 0
    for _ in range(R.TR_ROUNDS):
        ok = (ea[src] != INF) & (t >= ea[src])
        nxt = ea.copy()
        np.minimum.at(nxt, dst[ok], t[ok])
        ea = nxt
    expect = np.where(ea == INF, -1, ea)
    got = R.q_temporal_reachability(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == np.arange(n)).all()
    assert (got["ea_us"].to_numpy() == expect).all()
    # time-respecting: every reached node's arrival is a real edge time
    reached = got[got["ea_us"] >= 0]
    times = set(t.tolist()) | {0}
    assert set(reached["ea_us"].tolist()) <= times


def test_katz_matches_brute_force_and_dominates_scale():
    src, dst, _, n = _orders()
    x = np.full(n, R.KATZ_SCALE, dtype=np.int64)
    for _ in range(R.KATZ_ROUNDS):
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, x[src] // R.KATZ_ALPHA_DIV)
        x = R.KATZ_SCALE + s
    got = R.q_katz_centrality(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == np.arange(n)).all()
    assert (got["katz_fp"].to_numpy() == x).all()
    assert (got["katz_fp"] >= R.KATZ_SCALE).all()


def test_ind_discovery_matches_set_arithmetic():
    cols = {}
    for tbl, col in R.IND_COLS:
        t = pq.read_table(f"{SF}/{tbl}.parquet", columns=[col])
        cols[col] = set(t[col].to_numpy().tolist())
    got = R.q_ind_discovery(SF).to_pandas()
    assert len(got) == len(R.IND_COLS) * (len(R.IND_COLS) - 1)
    for row in got.itertuples():
        a, b = cols[row.a_col], cols[row.b_col]
        assert row.n_distinct_a == len(a)
        assert row.n_violations == len(a - b)
        assert row.holds == int(len(a - b) == 0)
    # the three designed-in FKs must be discovered
    fk = {(r.a_col, r.b_col): r.holds for r in got.itertuples()}
    assert fk[("o_custkey", "c_custkey")] == 1
    assert fk[("l_orderkey", "o_orderkey")] == 1
    assert fk[("l_suppkey", "s_suppkey")] == 1


def test_chao1_matches_formula_replay():
    import hashlib
    t = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"])
    k = t["o_orderkey"].to_numpy()
    c = t["o_custkey"].to_numpy()
    keep = np.array([
        int(hashlib.md5(f"chao:{x}".encode()).hexdigest()[:8], 16)
        % 100 < R.CHAO_PCT for x in k], bool)
    vals, cnt = np.unique(c[keep], return_counts=True)
    d, f1, f2 = len(vals), int((cnt == 1).sum()), int((cnt == 2).sum())
    chao = d + (f1 * (f1 - 1)) // (2 * (f2 + 1))
    ex = len(np.unique(c))
    got = R.q_chao1_distinct(SF).to_pandas().iloc[0]
    assert (got["d_obs"], got["f1"], got["f2"]) == (d, f1, f2)
    assert got["chao1"] == chao and got["n_exact"] == ex
    assert got["rel_err_fp"] == abs(chao - ex) * 10**9 // ex
    # Chao1 must beat the raw sample distinct as an estimate of ex
    assert abs(chao - ex) <= abs(d - ex)


def test_interval_overlap_pairs_matches_quadratic_replay():
    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts"])
    df = t.to_pandas()
    df["t"] = df["ts"].astype("datetime64[us]").astype(np.int64)
    expect = {}
    for u, g in df.groupby("user_id"):
        ts = g["t"].to_numpy()
        ids = g["event_id"].to_numpy()
        n = 0
        for i in range(len(ts)):
            dt = ts - ts[i]
            n += int(((dt >= 0) & (dt < R.OVERLAP_W_US)
                      & ((dt > 0) | (ids[i] < ids))).sum())
        if n:
            expect[u] = n
    got = R.q_interval_overlap_pairs(SF).to_pandas()
    assert dict(zip(got["user_id"], got["n_pairs"])) == expect


def test_assoc_rules_consistent_with_frequent_itemsets():
    fi = R.q_frequent_itemsets(SF, min_support=R.ASSOC_MIN_SUPPORT) \
        .to_pandas()
    ar = R.q_assoc_rules(SF).to_pandas()
    # every frequent pair yields exactly two directed rules, same support
    assert len(ar) == 2 * len(fi)
    sup = {(r.item_a, r.item_b): r.support for r in fi.itertuples()}
    for r in ar.itertuples():
        key = tuple(sorted((r.antecedent, r.consequent)))
        assert sup[key] == r.support
        assert 0 < r.conf_fp <= 10**9
        # conf * N // sup(consequent) identity
    # lift symmetry within integer floor error: lift(a→b) ≈ lift(b→a)
    m = ar.set_index(["antecedent", "consequent"])["lift_fp"]
    for (a, b) in list(m.index):
        assert abs(int(m[(a, b)]) - int(m[(b, a)])) * 50 <= \
            max(int(m[(a, b)]), 1)


def test_encoding_audit_matches_sorted_replay():
    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_orderkey", "l_linenumber"] + R.ENC_COLS)
    df = t.to_pandas().sort_values(["l_orderkey", "l_linenumber"]) \
        .reset_index(drop=True)
    got = R.q_encoding_audit(SF).to_pandas().set_index("col")
    for c in R.ENC_COLS:
        v = df[c].to_numpy()
        runs = 1 + int((v[1:] != v[:-1]).sum())
        assert got.loc[c, "n_rows"] == len(df)
        assert got.loc[c, "n_runs"] == runs
        assert got.loc[c, "n_distinct"] == len(np.unique(v))
        assert got.loc[c, "runs_per_1k_fp"] == runs * 10**9 // len(df)


def test_boolean_retrieval_matches_set_replay():
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text", "source"]).to_pandas()
    expect = {}
    for r in t.itertuples():
        toks = set(R._TOKEN.findall(r.text.lower()))
        if all(q in toks for q in R.BOOLQ_AND) and R.BOOLQ_NOT not in toks:
            expect[r.source] = expect.get(r.source, 0) + 1
    got = R.q_boolean_retrieval(SF).to_pandas()
    assert dict(zip(got["source"], got["n_docs"])) == expect
    assert sum(expect.values()) > 0  # the fixed query really selects


def test_personalized_pagerank_matches_brute_force():
    src, dst, _, n = _orders()
    od = np.bincount(src, minlength=n).astype(np.int64)
    x = np.zeros(n, dtype=np.int64)
    x[R.PPR_SEED] = R.PPR_SCALE
    for _ in range(R.PPR_ITERS):
        c = np.where(od[src] > 0, x[src] // np.maximum(od[src], 1), 0)
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst, c)
        x = ((100 - R.PPR_RESTART_PCT) * s) // 100
        x[R.PPR_SEED] += R.PPR_RESTART_PCT * R.PPR_SCALE // 100
    got = R.q_personalized_pagerank(SF).to_pandas() \
        .sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == np.arange(n)).all()
    assert (got["ppr_fp"].to_numpy() == x).all()
    # mass concentrates near the seed: seed must hold the max score
    assert got["ppr_fp"].idxmax() == R.PPR_SEED
