"""Fourth-session round-3 operators: encoding-artifact audit,
label-propagation communities, NOT-IN/NOT-EXISTS null-semantics audit.
DuckDB parity is covered by the oracle gate (tools/check_oracles.py);
these tests replay a brute-force reference (pure python / numpy) and
pin the structural invariants the SQL can't state directly (tier
equality, 3VL zero-row law, synchronous-update semantics)."""

import hashlib

import numpy as np
import pandas as pd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- mojibake audit


def test_mojibake_audit_matches_python_replay():
    docs = T(SF, "documents", ["doc_id", "text", "source"]).to_pandas()
    rows = {}
    for did, txt, src in zip(docs["doc_id"], docs["text"],
                             docs["source"]):
        h = hashlib.md5(str(did).encode()).hexdigest()
        t = txt
        if h[0] in "01":
            t += R._MOJI_SEQ
        if h[1] == "f":
            t += R._MOJI_CTRL
        if h[2] in "012":
            t += R._MOJI_REPL
        moji = "Ã" in t
        repl = R._MOJI_REPL in t
        ctrl = R._MOJI_CTRL in t
        r = rows.setdefault(src, [0, 0, 0, 0, 0])
        r[0] += 1
        r[1] += moji
        r[2] += repl
        r[3] += ctrl
        r[4] += moji or repl or ctrl
    exp = pd.DataFrame(
        [(s, *v, v[4] * R.MOJI_SCALE // v[0])
         for s, v in sorted(rows.items())],
        columns=["source", "n_docs", "n_mojibake", "n_replacement",
                 "n_ctrl", "n_bad", "bad_rate_fp"])
    got = (R.q_mojibake_audit(SF).to_pandas()
           .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[exp.columns].astype("int64", errors="ignore").reset_index(
            drop=True),
        exp.astype(got[exp.columns].dtypes.to_dict()))


def test_mojibake_audit_nontrivial():
    got = R.q_mojibake_audit(SF).to_pandas()
    # the md5-keyed injection must actually fire — an all-zero audit
    # would pass a buggy detector
    assert got["n_mojibake"].sum() > 0
    assert got["n_replacement"].sum() > 0
    assert got["n_ctrl"].sum() > 0
    assert (got["n_bad"] <= got["n_docs"]).all()


# ------------------------------------------- label propagation (LPA)


def _lpa_replay(iters: int) -> pd.DataFrame:
    n = T(SF, "customer", ["c_custkey"]).count()
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    s = o["o_custkey"].to_numpy(np.int64)
    d = (o["o_orderkey"].to_numpy(np.int64) % n)
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    lab = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        votes: dict = {}
        for u, v in zip(src, dst):
            key = (int(v), int(lab[u]))
            votes[key] = votes.get(key, 0) + 1
        nxt = lab.copy()
        best: dict = {}
        for (v, lv), c in votes.items():
            cur = best.get(v)
            if cur is None or (c, -lv) > (cur[0], -cur[1]):
                best[v] = (c, lv)
        for v, (c, lv) in best.items():
            nxt[v] = lv
        lab = nxt
    return pd.DataFrame({"node": np.arange(n, dtype=np.int64),
                         "lab": lab})


def test_label_propagation_matches_sequential_replay():
    exp = _lpa_replay(R.LPA_ITERS)
    got = (R.q_label_propagation(SF).to_pandas()
           .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["node", "lab"]], exp)


def test_label_propagation_tiers_identical():
    # force the distributed join tier and pin it to the single-task one
    single = (R.q_label_propagation(SF).to_pandas()
              .sort_values("node").reset_index(drop=True))
    dist = (R.q_label_propagation(SF, max_single_edges=0).to_pandas()
            .sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        dist[["node", "lab"]].astype("int64"),
        single[["node", "lab"]].astype("int64"))


def test_label_propagation_coarsens():
    # labels only merge (distinct count can't exceed the node count)
    got = R.q_label_propagation(SF).to_pandas()
    n = len(got)
    assert got["lab"].nunique() <= n
    # every surviving label is a real node id
    assert got["lab"].isin(got["node"]).all()


# ------------------------------------------- NOT IN null semantics


def test_not_in_null_audit_matches_set_replay():
    sup = T(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    vals = set()
    has_null = False
    for sk, nk in zip(sup["s_suppkey"], sup["s_nationkey"]):
        if int(sk) % R.NIN_NULL_MOD == 0:
            has_null = True
        else:
            vals.add(int(nk))
    cust = T(SF, "customer", ["c_nationkey"]).to_pandas()
    keys = cust["c_nationkey"].astype("int64")
    n_in = int(keys.isin(vals).sum())
    n_miss = int((~keys.isin(vals)).sum())
    got = R.q_not_in_null_audit(SF).to_pandas().iloc[0]
    assert int(got["n_customers"]) == len(cust)
    assert int(got["n_in"]) == n_in
    assert int(got["n_not_exists"]) == n_miss
    assert int(got["has_null"]) == int(has_null)
    # the 3VL law itself: one NULL in the list kills every NOT IN row
    assert int(got["n_not_in"]) == (0 if has_null else n_miss)


# --------------------------------------- JL projection audit


def test_jl_projection_matches_numpy_replay():
    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.copysign(np.floor(np.abs(X * 1e4) + 0.5), X * 1e4).astype(
        np.int64)
    S = np.empty((R.JL_IN_DIM, R.JL_OUT_DIM), np.int64)
    for i in range(R.JL_IN_DIM):
        for k in range(R.JL_OUT_DIM):
            h = hashlib.md5(f"{i},{k}".encode()).hexdigest()
            S[i, k] = 1 if h[0] <= "7" else -1
    y = q @ S
    n2o = (q * q).sum(axis=1)
    n2p = (y * y).sum(axis=1)
    den = R.JL_OUT_DIM * n2o
    exp_ratio = np.where(
        den > 0,
        (n2p // np.maximum(den, 1)) * R.JL_RATIO_SCALE
        + (n2p % np.maximum(den, 1)) * R.JL_RATIO_SCALE
        // np.maximum(den, 1), 0)
    got = (R.q_jl_projection_audit(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    order = np.argsort(emb["vec_id"].to_numpy())
    assert (got["n2_orig"].to_numpy() == n2o[order]).all()
    assert (got["n2_proj"].to_numpy() == n2p[order]).all()
    assert (got["ratio_fp"].to_numpy() == exp_ratio[order]).all()


def test_jl_projection_concentrates():
    got = R.q_jl_projection_audit(SF).to_pandas()
    # E[ratio]=1 under JL; mean over the corpus must concentrate
    mean = got["ratio_fp"].mean() / R.JL_RATIO_SCALE
    assert 0.7 < mean < 1.3
    # the ±1 matrix is balanced by construction
    S = R._jl_signs()
    assert abs(int(S.sum())) < R.JL_IN_DIM * R.JL_OUT_DIM // 4


# --------------------------------- multi-source distance histogram


def _bfs_dist(src, dst, n, s0, hops):
    dist = {s0: 0}
    frontier = {s0}
    adj = {}
    for u, v in zip(src, dst):
        adj.setdefault(int(u), []).append(int(v))
    for h in range(1, hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


def test_distance_distribution_matches_python_bfs():
    n = T(SF, "customer", ["c_custkey"]).count()
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    src = o["o_custkey"].to_numpy(np.int64)
    dst = o["o_orderkey"].to_numpy(np.int64) % n
    got = (R.q_distance_distribution(SF).to_pandas()
           .sort_values(["seed", "hop"]).reset_index(drop=True))
    for si in range(R.DDIST_SEEDS):
        s0 = (si * n) // R.DDIST_SEEDS
        dist = _bfs_dist(src, dst, n, s0, R.DDIST_HOPS)
        for h in range(R.DDIST_HOPS + 1):
            exp = sum(1 for d in dist.values() if d == h)
            row = got[(got["seed"] == si) & (got["hop"] == h)]
            assert int(row["n_nodes"].iloc[0]) == exp
        unr = got[(got["seed"] == si) & (got["hop"] == -1)]
        assert int(unr["n_nodes"].iloc[0]) == n - len(dist)


def test_distance_distribution_tiers_identical():
    single = (R.q_distance_distribution(SF).to_pandas()
              .sort_values(["seed", "hop"]).reset_index(drop=True))
    dist = (R.q_distance_distribution(SF, max_single_edges=0)
            .to_pandas().sort_values(["seed", "hop"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        dist.astype("int64"), single.astype("int64"))


# --------------------------------------- soundex phonetic blocking


def test_soundex_simplified_spec():
    # classic examples under the simplified (h/w = vowel) variant
    assert R._soundex_simplified("ROBERT") == "R163"
    assert R._soundex_simplified("SMITH") == "S530"
    assert R._soundex_simplified("SMYTH") == "S530"
    assert R._soundex_simplified("A") == "A000"
    assert R._soundex_simplified("AUBREY") == "A160"
    # squeeze: double letters collapse
    assert R._soundex_simplified("LLOYD") == "L300"
    # vowel-initial: first consonant digit is kept
    assert R._soundex_simplified("ELM") == "E450"


def test_soundex_blocking_matches_python_replay():
    parts = T(SF, "part", ["p_partkey", "p_name"]).to_pandas()
    from collections import defaultdict
    block = defaultdict(lambda: [0, set()])
    for nm in parts["p_name"]:
        w = nm.split(" ", 1)[0].upper()
        c = R._soundex_simplified(w)
        block[c][0] += 1
        block[c][1].add(w)
    got = (R.q_soundex_blocking(SF).to_pandas()
           .sort_values("code").reset_index(drop=True))
    assert len(got) == len(block)
    for _, row in got.iterrows():
        n, words = block[row["code"]]
        assert int(row["n_parts"]) == n
        assert int(row["n_words"]) == len(words)


# --------------------------------------- randomized response (LDP)


def test_randomized_response_matches_python_replay():
    cust = T(SF, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
    segs = sorted(cust["c_mktsegment"].unique().tolist())
    k = len(segs)
    idx = {s: i for i, s in enumerate(segs)}
    hexpos = "0123456789abcdef"
    obs = {s: 0 for s in segs}
    true = {s: 0 for s in segs}
    for ck, ts in zip(cust["c_custkey"], cust["c_mktsegment"]):
        true[ts] += 1
        h = hashlib.md5(f"rr,{ck}".encode()).hexdigest()
        if hexpos.index(h[0]) < R.RR_KEEP_OF_16:
            obs[ts] += 1
        else:
            j = hexpos.index(h[1]) % (k - 1)
            obs[segs[j + (1 if j >= idx[ts] else 0)]] += 1
    n = len(cust)

    def tdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    got = (R.q_randomized_response(SF).to_pandas()
           .sort_values("seg").reset_index(drop=True))
    for _, row in got.iterrows():
        s = row["seg"]
        assert int(row["n_true"]) == true[s]
        assert int(row["n_obs"]) == obs[s]
        est = tdiv((16 * obs[s] - n) * R.RR_SCALE, 11)
        assert int(row["est_fp"]) == est
        assert int(row["err_fp"]) == est - true[s] * R.RR_SCALE


def test_randomized_response_unbiased_in_aggregate():
    got = R.q_randomized_response(SF).to_pandas()
    n = int(got["n_true"].sum())
    # estimates sum to ~n (exactly n up to k·trunc error)
    assert abs(int(got["est_fp"].sum()) - n * R.RR_SCALE) \
        <= len(got) * R.RR_SCALE
    # the mechanism keeps ~3/4 of reports truthful: total |err| is
    # bounded well away from the all-noise regime
    assert (got["n_obs"].sum()) == n


# --------------------------------------- aggregate NULL semantics


def test_agg_null_semantics_matches_pandas_replay():
    o = T(SF, "orders",
          ["o_orderkey", "o_orderstatus", "o_totalprice"]).to_pandas()
    cents = np.copysign(
        np.floor(np.abs(o["o_totalprice"].to_numpy() * 100.0) + 0.5),
        o["o_totalprice"].to_numpy()).astype(np.int64)
    isnull = (o["o_orderkey"].to_numpy(np.int64) % R.AGG_NULL_MOD) == 0
    rows = []
    for grp, st, nu, c in zip(o["o_orderstatus"], o["o_orderstatus"],
                              isnull, cents):
        rows.append((grp, None if nu else int(c)))
        if nu:
            rows.append(("∅", None))
    df = pd.DataFrame(rows, columns=["grp", "cents"])
    got = (R.q_agg_null_semantics(SF).to_pandas()
           .sort_values("grp").reset_index(drop=True))
    for _, row in got.iterrows():
        sub = df[df["grp"] == row["grp"]]["cents"]
        assert int(row["n_rows"]) == len(sub)
        assert int(row["n_vals"]) == sub.notna().sum()
        if sub.notna().sum() == 0:
            assert pd.isna(row["sum_cents"])
            assert pd.isna(row["min_cents"])
            assert pd.isna(row["avg_fp"])
        else:
            assert int(row["sum_cents"]) == int(sub.dropna().sum())
            assert int(row["min_cents"]) == int(sub.dropna().min())
            assert int(row["avg_fp"]) == (
                int(sub.dropna().sum()) * 1_000_000
                // int(sub.notna().sum()))


def test_agg_null_semantics_has_all_null_group():
    got = R.q_agg_null_semantics(SF).to_pandas()
    nul = got[got["grp"] == "∅"]
    assert len(nul) == 1
    # COUNT(*) > 0 while COUNT(col) = 0 and SUM is NULL — the law
    assert int(nul["n_rows"].iloc[0]) > 0
    assert int(nul["n_vals"].iloc[0]) == 0
    assert pd.isna(nul["sum_cents"].iloc[0])


# --------------------------------------- NULL-key join semantics


def test_null_join_semantics_matches_replay():
    o = T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
    c = set(T(SF, "customer", ["c_custkey"]).to_pandas()["c_custkey"])
    isnull = (o["o_orderkey"].to_numpy(np.int64)
              % R.JOIN_NULL_MOD) == 0
    keys = o["o_custkey"].to_numpy(np.int64)
    n_nullkey = int(isnull.sum())
    n_inner = int(sum(1 for nu, k in zip(isnull, keys)
                      if not nu and int(k) in c))
    got = R.q_null_join_semantics(SF).to_pandas().iloc[0]
    assert int(got["n_orders"]) == len(o)
    assert int(got["n_nullkey"]) == n_nullkey
    assert int(got["n_inner"]) == n_inner
    assert int(got["n_left_unmatched"]) == len(o) - n_inner
    # NULL never equals NULL — even against a NULL-bearing build side
    assert int(got["n_null_to_null"]) == 0


# --------------------------------------- Unicode NFC audit


def test_unicode_nfc_audit_matches_python_replay():
    import unicodedata as ud
    docs = T(SF, "documents", ["doc_id", "text", "source"]).to_pandas()
    rows = {}
    for did, txt, src in zip(docs["doc_id"], docs["text"],
                             docs["source"]):
        h = hashlib.md5(str(did).encode()).hexdigest()
        t = txt + ("e" + R._NFC_COMBINING if h[3] in "0123" else "")
        n = ud.normalize("NFC", t)
        r = rows.setdefault(src, [0, 0, 0])
        r[0] += 1
        r[1] += int(n != t)
        r[2] += len(t) - len(n)
    got = (R.q_unicode_nfc_audit(SF).to_pandas()
           .sort_values("source").reset_index(drop=True))
    # injection must fire — all-NFC corpora would mask a broken check
    assert got["n_nonnfc"].sum() > 0
    for _, row in got.iterrows():
        n_docs, n_nonnfc, delta = rows[row["source"]]
        assert int(row["n_docs"]) == n_docs
        assert int(row["n_nonnfc"]) == n_nonnfc
        assert int(row["chars_recovered"]) == delta
        assert int(row["nonnfc_rate_fp"]) == \
            n_nonnfc * R.NFC_SCALE // n_docs


# --------------------------------------- lakehouse merge-on-read


def test_merge_on_read_matches_pandas_replay():
    o = (T(SF, "orders", ["o_orderkey", "o_custkey"]).to_pandas()
         .sort_values("o_orderkey").reset_index(drop=True))
    pos = np.arange(len(o), dtype=np.int64)
    pd_mask = (pos % R.MOR_POS_MOD) == 0
    eq_mask = ((o["o_custkey"].to_numpy(np.int64) % R.MOR_EQ_MOD) == 0) \
        & ~pd_mask
    live = ~pd_mask & ~eq_mask
    got = R.q_merge_on_read(SF).to_pandas().iloc[0]
    assert int(got["n_base"]) == len(o)
    assert int(got["n_pos_del"]) == int(pd_mask.sum())
    assert int(got["n_eq_del"]) == int(eq_mask.sum())
    assert int(got["n_live"]) == int(live.sum())
    assert int(got["live_key_sum"]) == \
        int(o["o_orderkey"].to_numpy(np.int64)[live].sum())
    # the ledger balances
    assert int(got["n_base"]) == (int(got["n_pos_del"])
                                  + int(got["n_eq_del"])
                                  + int(got["n_live"]))


# --------------------------------------- calendar month-shift audit


def test_add_months_audit_matches_python_calendar():
    import calendar
    o = T(SF, "orders", ["o_orderdate"]).to_pandas()
    rows = {}
    for d in o["o_orderdate"]:
        for k in R.ADDM_SHIFTS:
            y, m = d.year, d.month
            m2 = m + k
            y2, m2 = y + (m2 - 1) // 12, (m2 - 1) % 12 + 1
            dim = calendar.monthrange(y2, m2)[1]
            dom2 = min(d.day, dim)
            key = (k, f"{y2:04d}-{m2:02d}")
            r = rows.setdefault(key, [0, 0, 0])
            r[0] += 1
            r[1] += dom2
            r[2] += int(dom2 < d.day)
    got = (R.q_add_months_audit(SF).to_pandas()
           .sort_values(["k", "month"]).reset_index(drop=True))
    assert len(got) == len(rows)
    for _, row in got.iterrows():
        n, sd, nc = rows[(int(row["k"]), row["month"])]
        assert int(row["n"]) == n
        assert int(row["sum_dom"]) == sd
        assert int(row["n_clamped"]) == nc


def test_add_months_clamps_leap_february():
    # direct spec check of the vectorized kernel via a crafted frame
    d64 = np.array(["2024-01-31", "2023-01-31", "2024-02-29",
                    "2023-12-31"], dtype="datetime64[D]")
    m64 = d64.astype("datetime64[M]")
    dom = (d64 - m64).astype(np.int64) + 1
    m2 = m64 + np.timedelta64(1, "M")
    dim = ((m2 + np.timedelta64(1, "M")).astype("datetime64[D]")
           - m2.astype("datetime64[D]")).astype(np.int64)
    dom2 = np.minimum(dom, dim)
    assert dom2.tolist() == [29, 28, 29, 31]
