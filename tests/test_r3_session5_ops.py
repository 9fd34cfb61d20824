"""Fifth-session round-3 operators. DuckDB parity is covered by the
oracle gate (tools/check_oracles.py); these tests replay brute-force
references (pure python / numpy) and pin invariants the SQL can't
state directly."""

import hashlib

import numpy as np
import pandas as pd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- KNN-Shapley


def _knn_shapley_reference():
    """The ORIGINAL Jia et al. recurrence (sequential, per test point),
    in the same ×1e9 integer domain — validates the engine's telescoped
    suffix-sum reformulation against the published form."""
    emb = T(SF, "embeddings",
            ["vec_id", "embedding", "label"]).to_pandas()
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    labs = emb["label"].to_numpy(np.int64)
    x = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    xfp = np.floor(np.abs(x * 1e6) + 0.5).astype(np.int64) * \
        np.sign(x * 1e6).astype(np.int64)  # round half away from zero
    hx = np.array([hashlib.md5(f"knnshap,{v}".encode()).hexdigest()
                   for v in ids])
    torder = np.lexsort((ids, hx))[:R.KNNSHAP_Q]
    test_idx = set(torder.tolist())
    train = np.array([i for i in range(len(ids)) if i not in test_idx])
    total = {int(ids[i]): 0 for i in train}
    for q in torder:
        diff = xfp[train] - xfp[q]
        dist = (diff * diff).sum(axis=1)
        order = train[np.lexsort((ids[train], dist))]
        n = len(order)
        ind = (labs[order] == labs[q]).astype(np.int64)
        s = np.zeros(n, np.int64)
        s[n - 1] = ind[n - 1] * (1_000_000_000 // n)
        for i in range(n - 2, -1, -1):  # published recurrence, verbatim
            s[i] = s[i + 1] + (ind[i] - ind[i + 1]) * (
                1_000_000_000 // max(i + 1, R.KNNSHAP_K))
        for pos, tr in enumerate(order):
            total[int(ids[tr])] += int(s[pos])
    return total


def test_knn_shapley_matches_sequential_recurrence(ray_session):
    got = R.q_knn_shapley(SF).to_pandas().sort_values("vec_id") \
        .reset_index(drop=True)
    want = _knn_shapley_reference()
    assert len(got) == len(want)
    assert (got["n_tests"] == R.KNNSHAP_Q).all()
    for _, row in got.iterrows():
        assert int(row["shapley_fp"]) == want[int(row["vec_id"])], \
            int(row["vec_id"])


def test_knn_shapley_efficiency_axiom(ray_session):
    """Shapley efficiency: per test point the values sum to the total
    utility ind over the full train set divided by N... in the KNN
    form, Σ_i s_i = Σ_i ind_i · w'_i telescopes to the K-NN utility;
    we pin the weaker but exact law that the GRAND total equals the
    sum the sequential reference produces (cross-check of the two
    independent implementations is in the test above), and that any
    train point identical in label to all test points has value ≥ any
    point matching none (monotonicity in label agreement is not a
    Shapley axiom in general, so assert only the global-sum law here).
    """
    got = R.q_knn_shapley(SF).to_pandas()
    want = _knn_shapley_reference()
    assert int(got["shapley_fp"].sum()) == sum(want.values())


# ------------------------------------------------- SNM blocking


def test_snm_blocking_matches_pandas_replay(ray_session):
    got = R.q_snm_blocking(SF).to_pandas().iloc[0]
    df = T(SF, "customer",
           ["c_custkey", "c_nationkey", "c_acctbal"]).to_pandas()
    bal = np.floor(np.abs(df["c_acctbal"].to_numpy() * 100) + 0.5) \
        .astype(np.int64) * np.sign(df["c_acctbal"].to_numpy() * 100) \
        .astype(np.int64)
    nk = df["c_nationkey"].to_numpy(np.int64)
    ck = df["c_custkey"].to_numpy(np.int64)
    order = np.lexsort((ck, bal))
    bal, nk = bal[order], nk[order]
    n = len(bal)
    np_, nm, gap = 0, 0, 0
    w = R.SNM_WINDOW
    for i in range(n):
        for j in range(i + 1, min(i + w, n)):
            np_ += 1
            nm += int(nk[i] == nk[j])
            gap += int(bal[j] - bal[i])
    assert int(got["n_records"]) == n
    assert int(got["n_pairs"]) == np_
    assert int(got["n_match_pairs"]) == nm
    assert int(got["pair_gap_sum"]) == gap
    # closed form: with N ≥ w, the window yields (w−1)N − w(w−1)/2 pairs
    assert np_ == (w - 1) * n - w * (w - 1) // 2
    assert int(got["reduction_ratio_fp"]) == \
        np_ * 1_000_000_000 // (n * (n - 1) // 2)


# ------------------------------------------------- bandit offline eval


def test_bandit_offline_eval_matches_python_replay(ray_session):
    got = R.q_bandit_offline_eval(SF).to_pandas() \
        .sort_values("arm").reset_index(drop=True)
    ev = T(SF, "events", ["event_id", "user_id", "value"]).to_pandas()
    rows = {a: [0, 0, 0] for a in range(R.BANDIT_ARMS)}
    for e, u, v in zip(ev["event_id"], ev["user_id"], ev["value"]):
        logged = int(hashlib.md5(f"log,{e}".encode())
                     .hexdigest()[:2], 16) % R.BANDIT_ARMS
        target = int(hashlib.md5(f"tgt,{u}".encode())
                     .hexdigest()[:2], 16) % R.BANDIT_ARMS
        r = int(np.floor(abs(v * 1e6) + 0.5) * np.sign(v))
        rows[target][0] += 1
        if logged == target:
            rows[target][1] += 1
            rows[target][2] += r
    assert len(got) == R.BANDIT_ARMS
    for _, row in got.iterrows():
        nt, nm, mr = rows[int(row["arm"])]
        assert int(row["n_target"]) == nt
        assert int(row["n_matched"]) == nm
        assert int(row["matched_reward_fp"]) == mr
        assert int(row["replay_value_fp"]) == mr // max(nm, 1)
        assert int(row["ips_value_fp"]) == \
            mr * R.BANDIT_ARMS // max(nt, 1)
    # uniform logging: match rate should be near 1/A on every arm
    frac = got["n_matched"].sum() / got["n_target"].sum()
    assert abs(frac - 1 / R.BANDIT_ARMS) < 0.08


# ------------------------------------------------- Allen interval audit


def test_allen_interval_audit_matches_quadratic_replay(ray_session):
    got = R.q_allen_interval_audit(SF).to_pandas()
    counts = dict(zip(got["relation"], got["n_pairs"].astype(int)))
    ev = T(SF, "events", ["event_id", "user_id", "ts"]).to_pandas()
    t = ev["ts"].to_numpy().astype("datetime64[us]").view("int64")
    s = (t // (R.ALLEN_GRID_S * 1_000_000)) * R.ALLEN_GRID_S
    i = ev["event_id"].to_numpy(np.int64)
    e = s + (i % R.ALLEN_DUR_STEPS + 1) * 60
    u = ev["user_id"].to_numpy(np.int64)
    want: dict = {}
    n = len(u)
    for a in range(n):
        for b in range(n):
            if a == b or u[a] != u[b]:
                continue
            ka, kb = (s[a], e[a], i[a]), (s[b], e[b], i[b])
            if not (ka < kb and s[b] - s[a] < R.ALLEN_W_S):
                continue
            if s[a] < s[b]:
                if e[a] < s[b]:
                    rel = "before"
                elif e[a] == s[b]:
                    rel = "meets"
                elif e[a] < e[b]:
                    rel = "overlaps"
                elif e[a] == e[b]:
                    rel = "finished_by"
                else:
                    rel = "contains"
            else:
                rel = "starts" if e[a] < e[b] else "equals"
            want[rel] = want.get(rel, 0) + 1
    assert counts == want
    # boundary relations must actually occur on the lattice-built
    # intervals (otherwise the audit degenerates to overlap counting)
    assert sum(counts.get(r, 0) for r in
               ("meets", "starts", "finished_by", "equals")) > 0


# ------------------------------------------------- Bloom FPR audit


def test_bloom_fpr_audit_matches_python_replay(ray_session):
    got = R.q_bloom_fpr_audit(SF).to_pandas().iloc[0]
    m, k = R.BLOOM_AUDIT_M, R.BLOOM_AUDIT_K
    sup = T(SF, "supplier", ["s_suppkey"]).to_pandas()
    cust = T(SF, "customer", ["c_custkey"]).to_pandas()

    def pos(key, j):
        return int(hashlib.md5(f"bf{j},{key}".encode())
                   .hexdigest()[:8], 16) % m

    occ = {pos(int(x), j) for x in sup["s_suppkey"] for j in range(k)}
    ins = set(int(x) for x in sup["s_suppkey"])
    fl = pres = fp = 0
    for key in cust["c_custkey"]:
        key = int(key)
        flagged = all(pos(key, j) in occ for j in range(k))
        present = key in ins
        fl += flagged
        pres += present
        fp += flagged and not present
    assert int(got["n_inserted"]) == len(ins)
    assert int(got["n_bits_set"]) == len(occ)
    assert int(got["n_probes"]) == len(cust)
    assert int(got["n_present"]) == pres
    assert int(got["n_flagged"]) == fl
    assert int(got["n_false_pos"]) == fp
    # no false negatives, ever — the Bloom guarantee
    assert fl >= pres
    assert int(got["fpr_fp"]) == fp * 1_000_000_000 // max(
        len(cust) - pres, 1)


# ------------------------------------------------- Haar synopsis


def test_haar_synopsis_matches_python_replay(ray_session):
    got = R.q_haar_synopsis(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    day = ev["ts"].to_numpy().astype("datetime64[us]") \
        .view("int64") // 86_400_000_000
    ph = day % R.HAAR_BUCKETS
    for uid, grp in pd.DataFrame(
            {"u": ev["user_id"], "ph": ph}).groupby("u"):
        x = np.bincount(grp["ph"].to_numpy(),
                        minlength=R.HAAR_BUCKETS).astype(np.int64)
        es = []
        for _ in range(4):
            a = (x[0::2] + x[1::2]) // 2
            es.append(int(np.abs(x[0::2] - x[1::2]).sum()))
            x = a
        row = got.loc[int(uid)]
        assert int(row["dc"]) == int(x[0])
        assert [int(row[f"e{i}"]) for i in range(1, 5)] == es


def test_haar_synopsis_invariants(ray_session):
    """S-transform invariants: a constant 16-long series has zero
    detail energy at EVERY level and dc == the constant; a single
    impulse has energy at every scale."""
    x = np.full(16, 7, np.int64)
    for _ in range(4):
        assert (np.abs(x[0::2] - x[1::2]) == 0).all()
        x = (x[0::2] + x[1::2]) // 2
    assert x[0] == 7
    x = np.zeros(16, np.int64)
    x[3] = 8
    seen = []
    for _ in range(4):
        seen.append(int(np.abs(x[0::2] - x[1::2]).sum()))
        x = (x[0::2] + x[1::2]) // 2
    assert all(e > 0 for e in seen)


# ------------------------------------------------- DGIM window count


def test_dgim_window_count_guarantee_and_space(ray_session):
    got = R.q_dgim_window_count(SF).to_pandas()
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    t_max = int(ev["ts"].to_numpy().astype("datetime64[us]")
                .view("int64").max())
    lo = t_max - R.DGIM_WINDOW_US
    per_user = {}
    for uid, grp in ev.groupby("user_id"):
        t = grp["ts"].to_numpy().astype("datetime64[us]").view("int64")
        per_user[int(uid)] = (int((t > lo).sum()), len(t))
    assert len(got) == len(per_user)
    for _, row in got.iterrows():
        exact, n = per_user[int(row["user_id"])]
        assert int(row["exact_in_window"]) == exact
        # the DGIM 50 % guarantee at r = 2 buckets per size
        assert int(row["abs_err"]) <= exact // 2 + 1
        # O(log² W) space: ≤ r · (⌊log2 n⌋ + 1) buckets
        assert int(row["n_buckets"]) <= R.DGIM_R * (
            int(np.floor(np.log2(max(n, 1)))) + 1)


# ------------------------------------------------- B-cubed evaluation


def test_b_cubed_eval_matches_per_item_replay(ray_session):
    """Replays the DEFINITION (per-item |C∩G|/|C| averaged), not the
    contingency-table identity the engine uses — validating the
    Σ n_cg²/n_c reformulation."""
    got = R.q_b_cubed_eval(SF).to_pandas().iloc[0]
    docs = T(SF, "documents", ["doc_id", "n_chars", "source"]) \
        .to_pandas()
    pred = (docs["n_chars"] // R.B3_BAND).to_numpy()
    gold = docs["source"].to_numpy()
    n = len(docs)
    # cell-order replay (the engine/oracle floor order): Σ n_cg²·S//n_c
    cells: dict = {}
    for pc_, g in zip(pred, gold):
        cells[(int(pc_), g)] = cells.get((int(pc_), g), 0) + 1
    n_c: dict = {}
    n_g: dict = {}
    for (c, g), v in cells.items():
        n_c[c] = n_c.get(c, 0) + v
        n_g[g] = n_g.get(g, 0) + v
    tp = sum(v * v * 1_000_000_000 // n_c[c]
             for (c, g), v in cells.items())
    tr = sum(v * v * 1_000_000_000 // n_g[g]
             for (c, g), v in cells.items())
    # per-item DEFINITION replay: Σ_d |C∩G|·S // |C| — floors per item,
    # so it may undershoot the cell-order sum by < 1 unit per item
    tp_item = tr_item = 0
    for i in range(n):
        same_c = pred == pred[i]
        same_g = gold == gold[i]
        inter = int((same_c & same_g).sum())
        tp_item += inter * 1_000_000_000 // int(same_c.sum())
        tr_item += inter * 1_000_000_000 // int(same_g.sum())
    assert 0 <= tp - tp_item < n and 0 <= tr - tr_item < n
    assert int(got["n_docs"]) == n
    assert int(got["b3_precision_fp"]) == tp // n
    assert int(got["b3_recall_fp"]) == tr // n
    p, r = tp // n, tr // n
    assert int(got["b3_f1_fp"]) == 2 * p * r // max(p + r, 1)
    # both metrics are proper fractions of 1e9
    assert 0 < p <= 1_000_000_000 and 0 < r <= 1_000_000_000


# ------------------------------------------------- join-order audit


def test_join_order_audit_invariants(ray_session):
    got = R.q_join_order_audit(SF).to_pandas() \
        .set_index("join_order")
    # symmetric orders must agree exactly (the estimate is commutative
    # in the first pair) ...
    assert got.loc["CO_L"].equals(got.loc["OC_L"])
    assert got.loc["OL_C"].equals(got.loc["LO_C"])
    # ... and the actual count is one number regardless of order
    assert got["actual_final"].nunique() == 1
    # q-error is max/min ≥ 1 by construction
    assert (got["q_error_fp"] >= 1_000_000).all()
    # FK-clean synthetic data: every lineitem joins through, so the
    # true final count equals |lineitem|
    n_l = T(SF, "lineitem", ["l_orderkey"]).count()
    assert int(got["actual_final"].iloc[0]) == n_l


# ------------------------------------------------- assignment audit


def test_assignment_audit_is_optimal_and_valid(ray_session):
    import itertools

    got = R.q_assignment_audit(SF).to_pandas()
    # a valid assignment: 5 sources, 5 DISTINCT targets
    assert len(got) == 5
    assert got["target"].nunique() == 5
    assert set(got["target"]) == set(R.ASSIGN_TARGETS)
    assert got["total_cost"].nunique() == 1
    assert int(got["cost_contrib"].sum()) == int(
        got["total_cost"].iloc[0])
    # optimality: no permutation beats the reported total
    prof = T(SF, "documents", ["source", "n_chars"]).to_pandas() \
        .groupby("source").agg(n=("n_chars", "size"),
                               s=("n_chars", "sum")) \
        .sort_index().head(5)
    n = prof["n"].to_numpy(np.int64)
    s = prof["s"].to_numpy(np.int64)
    cost = np.abs(s[:, None] - np.asarray(
        R.ASSIGN_TARGETS, np.int64)[None, :] * n[:, None])
    best = min(int(sum(cost[i, p[i]] for i in range(5)))
               for p in itertools.permutations(range(5)))
    assert int(got["total_cost"].iloc[0]) == best


# ------------------------------------------------- business-day audit


def test_business_day_audit_spec_and_replay(ray_session):
    got = R.q_business_day_audit(SF).to_pandas().set_index("dow")
    # 1970-01-01 anchor: day 0 must code to Thursday=4
    assert (0 + 4) % 7 == 4
    # Saturday (6) rolls +2 to Monday (1); Sunday (0) +1 to Monday
    if 6 in got.index:
        r = got.loc[6]
        assert int(r["n_rolled"]) == int(r["n"])
        assert int(r["sum_shift_days"]) == 2 * int(r["n"])
        assert int(r["sum_landed_dow"]) == 1 * int(r["n"])
    if 0 in got.index:
        r = got.loc[0]
        assert int(r["sum_shift_days"]) == int(r["n"])
        assert int(r["sum_landed_dow"]) == 1 * int(r["n"])
    # weekdays never roll and land on themselves
    for dow in range(1, 6):
        if dow in got.index:
            r = got.loc[dow]
            assert int(r["n_rolled"]) == 0
            assert int(r["sum_landed_dow"]) == dow * int(r["n"])
    # full replay
    df = T(SF, "orders", ["o_orderdate"]).to_pandas()
    d = df["o_orderdate"].to_numpy().astype("datetime64[D]") \
        .view("int64")
    dow = (d + 4) % 7
    for k in range(7):
        if int((dow == k).sum()) == 0:
            assert k not in got.index
        else:
            assert int(got.loc[k]["n"]) == int((dow == k).sum())


# ------------------------------------------------- Huffman lengths


def test_huffman_code_lengths_optimality_and_entropy(ray_session):
    got = R.q_huffman_code_lengths(SF).to_pandas()
    f = got["freq"].to_numpy(np.float64)
    ll = got["code_len"].to_numpy(np.int64)
    n = f.sum()
    # Kraft equality (re-asserted outside the query)
    assert abs(sum(2.0 ** -l for l in ll) - 1.0) < 1e-12
    # Shannon sandwich: H ≤ mean code length < H + 1
    p = f / n
    H = float(-(p * np.log2(p)).sum())
    mean_len = float((f * ll).sum() / n)
    assert H - 1e-9 <= mean_len < H + 1
    # independent construction (per-symbol depths via heapq twin)
    import heapq
    heap = [(int(fi), s, (s,)) for s, fi in
            zip(got["source"], got["freq"])]
    heapq.heapify(heap)
    depth = {s: 0 for s in got["source"]}
    while len(heap) > 1:
        f1, s1, m1 = heapq.heappop(heap)
        f2, s2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(s1, s2), m1 + m2))
    assert dict(zip(got["source"], got["code_len"].astype(int))) == depth


# ------------------------------------------------- secretary stopping


def test_secretary_stopping_matches_sequential_replay(ray_session):
    got = R.q_secretary_stopping(SF).to_pandas().iloc[0]
    df = T(SF, "customer", ["c_custkey", "c_acctbal"]).to_pandas()
    q = (np.floor(np.abs(df["c_acctbal"].to_numpy() * 100) + 0.5)
         * np.sign(df["c_acctbal"].to_numpy())).astype(np.int64)
    h = np.array([hashlib.md5(f"sec,{k}".encode()).hexdigest()
                  for k in df["c_custkey"]])
    order = np.lexsort((df["c_custkey"].to_numpy(), h))
    qs = q[order]
    n = len(qs)
    k = n * R.SECRETARY_THRESH_PPM // 1_000_000
    bp = int(qs[:k].max()) if k > 0 else -1
    chosen = n - 1
    for i in range(k, n):
        if int(qs[i]) > bp:
            chosen = i
            break
    assert int(got["n"]) == n
    assert int(got["k_threshold"]) == k
    assert int(got["best_prefix_q"]) == bp
    assert int(got["chosen_rank"]) == chosen + 1
    assert int(got["chosen_q"]) == int(qs[chosen])
    assert int(got["hired_overall_best"]) == int(
        int(qs[chosen]) == int(qs.max()))


# ------------------------------------------------- ISO week audit


def test_iso_week_thursday_rule_spec():
    """Spec pins: the known tricky calendar dates."""
    import datetime as dt

    def iso(dstr):
        d = (dt.date.fromisoformat(dstr) - dt.date(1970, 1, 1)).days
        dow0 = (d + 3) % 7
        thu = d - dow0 + 3
        td = dt.date(1970, 1, 1) + dt.timedelta(days=int(thu))
        jan1 = (dt.date(td.year, 1, 1) - dt.date(1970, 1, 1)).days
        return td.year, (thu - jan1) // 7 + 1

    assert iso("2021-01-01") == (2020, 53)
    assert iso("2020-12-31") == (2020, 53)
    assert iso("2016-01-03") == (2015, 53)
    assert iso("2016-01-04") == (2016, 1)
    assert iso("2014-12-29") == (2015, 1)
    assert iso("1970-01-01") == (1970, 1)


def test_iso_week_audit_matches_python_calendar(ray_session):
    got = R.q_iso_week_audit(SF).to_pandas() \
        .sort_values(["isoyear", "week"]).reset_index(drop=True)
    df = T(SF, "orders", ["o_orderdate"]).to_pandas()
    want: dict = {}
    for ts in df["o_orderdate"]:
        iy, iw, _ = pd.Timestamp(ts).isocalendar()
        if iw == 1 or iw >= 52:
            want[(int(iy), int(iw))] = want.get(
                (int(iy), int(iw)), 0) + 1
    assert len(got) == len(want)
    for _, row in got.iterrows():
        assert want[(int(row["isoyear"]), int(row["week"]))] == \
            int(row["n"])


# ------------------------------------------------- ski rental / LRU


def test_ski_rental_guarantee_and_replay(ray_session):
    got = R.q_ski_rental(SF).to_pandas()
    ev = T(SF, "events", ["user_id", "ts"]).to_pandas()
    day = ev["ts"].to_numpy().astype("datetime64[us]") \
        .view("int64") // 86_400_000_000
    nd = pd.DataFrame({"u": ev["user_id"], "d": day}) \
        .groupby("u")["d"].nunique()
    B = R.SKI_BUY_COST
    for _, row in got.iterrows():
        d = int(nd[int(row["user_id"])])
        assert int(row["active_days"]) == d
        pol = d if d < B else 2 * B - 1
        assert int(row["policy_cost"]) == pol
        assert int(row["opt_cost"]) == min(d, B)
        # competitive guarantee, exact integer form
        assert pol * B <= (2 * B - 1) * min(d, B)


def test_lru_vs_belady_optimality(ray_session):
    got = R.q_lru_vs_belady(SF).to_pandas()
    assert (got["opt_hits"] >= got["lru_hits"]).all()
    assert (got["opt_hits"] <= got["n_refs"]).all()
    # independent OPT replay for one user
    ev = T(SF, "events", ["user_id", "ts", "event_id", "event_type"]) \
        .to_pandas()
    uid = int(got["user_id"].iloc[0])
    grp = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    refs = grp["event_type"].tolist()
    nxt: dict = {}
    nxt_use = [0] * len(refs)
    for i in range(len(refs) - 1, -1, -1):
        nxt_use[i] = nxt.get(refs[i], len(refs))
        nxt[refs[i]] = i
    cset: dict = {}
    opt = 0
    for i, r in enumerate(refs):
        if r in cset:
            opt += 1
        elif len(cset) >= R.CACHE_SIZE:
            victim = max(cset, key=lambda k: (cset[k], k))
            del cset[victim]
        cset[r] = nxt_use[i]
    row = got[got["user_id"] == uid].iloc[0]
    assert int(row["opt_hits"]) == opt
    assert int(row["n_refs"]) == len(refs)


# ------------------------------------------------- LIS / token bucket


def test_lis_per_user_matches_dp_replay(ray_session):
    got = R.q_lis_per_user(SF).to_pandas().set_index("user_id")
    ev = T(SF, "events",
           ["user_id", "ts", "event_id", "value"]).to_pandas()
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        v = (np.floor(np.abs(grp["value"].to_numpy() * 100) + 0.5)
             * np.sign(grp["value"].to_numpy())).astype(np.int64)
        # O(n²) DP reference (independent of patience sorting)
        n = len(v)
        dp = np.ones(n, np.int64)
        for i in range(n):
            for j in range(i):
                if v[j] < v[i]:
                    dp[i] = max(dp[i], dp[j] + 1)
        row = got.loc[int(uid)]
        assert int(row["lis_len"]) == int(dp.max())
        assert int(row["n_events"]) == n


def test_token_bucket_replay_guarantee_and_contention(ray_session):
    got = R.q_token_bucket_replay(SF).to_pandas()
    assert (got["n_accepted"] + got["n_throttled"]
            == got["n_refs" if "n_refs" in got else "n_events"]).all()
    assert (got["n_accepted"] <= got["accept_bound"]).all()
    # the compressed replay clock must produce real contention —
    # a limiter that never throttles is not being exercised
    assert int(got["n_throttled"].sum()) > 0
    # independent replay for one user
    ev = T(SF, "events", ["user_id", "ts", "event_id"]).to_pandas()
    uid = int(got["user_id"].iloc[0])
    grp = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"])
    t = grp["ts"].to_numpy().astype("datetime64[us]").view("int64")
    cap = R.TB_BURST * 1_000_000
    tok, prev, acc = cap, int(t[0]), 0
    for ti in t:
        tok = min(cap, tok + (int(ti) - prev)
                  * R.TB_RATE_PER_S * 1_000_000 // R.TB_CLOCK_DIV)
        prev = int(ti)
        if tok >= 1_000_000:
            tok -= 1_000_000
            acc += 1
    row = got[got["user_id"] == uid].iloc[0]
    assert int(row["n_accepted"]) == acc


# ------------------------------------------------- vocab growth


def test_vocab_growth_monotone_and_replay(ray_session):
    got = R.q_vocab_growth(SF).to_pandas() \
        .sort_values("checkpoint").reset_index(drop=True)
    assert len(got) == 4
    # growth curves are monotone; vocab is concave-ish (Heaps): the
    # per-quarter vocab increment must not grow
    assert got["n_docs"].is_monotonic_increasing
    assert got["n_tokens"].is_monotonic_increasing
    assert got["vocab_size"].is_monotonic_increasing
    inc = np.diff(np.concatenate([[0], got["vocab_size"].to_numpy()]))
    assert inc[0] == inc.max()  # the first quarter mints the most
    # replay the final checkpoint (= whole corpus)
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    vocab = set()
    ntok = 0
    for txt in docs["text"]:
        toks = R._TOKEN.findall(txt.lower())
        ntok += len(toks)
        vocab.update(toks)
    assert int(got["n_tokens"].iloc[-1]) == ntok
    assert int(got["vocab_size"].iloc[-1]) == len(vocab)
    assert int(got["n_docs"].iloc[-1]) == len(docs)


# ------------------------------------------------- Markov accuracy


def test_markov_next_accuracy_properties(ray_session):
    got = R.q_markov_next_accuracy(SF).to_pandas()
    trans = R.q_event_transitions(SF).to_pandas()
    # the argmax predictor can never score below the per-prev majority
    # share — and exactly equals it by construction
    for _, row in got.iterrows():
        grp = trans[trans["prev_event"] == row["prev_event"]]
        best = int(grp["n"].max())
        total = int(grp["n"].sum())
        assert int(row["n_hits"]) == best or (
            # tie on max count: predictor picks lexicographically
            # smallest, hits still equal the max count
            int(row["n_hits"]) == best)
        assert int(row["n_transitions"]) == total
        assert int(row["accuracy_fp"]) == best * 1_000_000 // total
        # predicted event achieves the max count
        assert int(grp.loc[grp["next_event"] == row["predicted_next"],
                           "n"].sum()) == best


# ------------------------------------------------- weighted Jaccard


def test_weighted_jaccard_sources_matches_counter_replay(ray_session):
    from collections import Counter

    got = R.q_weighted_jaccard_sources(SF).to_pandas()
    docs = T(SF, "documents", ["text", "source"]).to_pandas()
    srcs = sorted(docs["source"].unique())[:R.WJ_SOURCES]
    freqs = {s: Counter() for s in srcs}
    for txt, src in zip(docs["text"], docs["source"]):
        if src in freqs:
            freqs[src].update(R._TOKEN.findall(txt.lower()))
    assert len(got) == R.WJ_SOURCES * (R.WJ_SOURCES - 1) // 2
    for _, row in got.iterrows():
        a, b = freqs[row["src_a"]], freqs[row["src_b"]]
        vocab = set(a) | set(b)
        mn = sum(min(a[t], b[t]) for t in vocab)
        mx = sum(max(a[t], b[t]) for t in vocab)
        assert int(row["inter_w"]) == mn
        assert int(row["union_w"]) == mx
        assert int(row["wjaccard_fp"]) == mn * 10**9 // max(mx, 1)
        # weighted Jaccard is a proper [0, 1] similarity
        assert 0 <= int(row["wjaccard_fp"]) <= 10**9


# ------------------------------------------------- odds-ratio keywords


def test_odds_ratio_keywords_matches_counter_replay(ray_session):
    from collections import Counter

    got = R.q_odds_ratio_keywords(SF).to_pandas()
    docs = T(SF, "documents", ["text", "source"]).to_pandas()
    sa, sb = sorted(docs["source"].unique())[:2]
    fa, fb = Counter(), Counter()
    for txt, src in zip(docs["text"], docs["source"]):
        if src == sa:
            fa.update(R._TOKEN.findall(txt.lower()))
        elif src == sb:
            fb.update(R._TOKEN.findall(txt.lower()))
    ta, tb = sum(fa.values()), sum(fb.values())
    rows = []
    for t in set(fa) | set(fb):
        a, b = fa[t], fb[t]
        if a + b < R.OR_MIN_COUNT:
            continue
        rows.append((-((a + 1) * (tb - b + 1) * 10**6
                       // ((b + 1) * (ta - a + 1))), t, a, b))
    rows.sort()
    want = rows[:R.OR_TOP_K]
    assert len(got) == len(want)
    for row, (nor, t, a, b) in zip(got.itertuples(), want):
        assert (row.term, int(row.a), int(row.b),
                int(row.or_fp)) == (t, a, b, -nor)


# ------------------------------------------------- CDC chunking


def _cdc_chunks_ref(data: bytes):
    """Independent per-byte rolling-hash chunker (no vectorized
    shortcuts) — the reference the map kernel must match."""
    W, MASK, B = R.CDC_WINDOW, R.CDC_MASK, 257
    n = len(data)
    cuts = []
    if n >= W:
        MOD = 2 ** 64
        h = 0
        for k in range(W):
            h = (h * B + data[k]) % MOD
        top = pow(B, W - 1, MOD)
        for i in range(n - W + 1):
            if i > 0:
                h = ((h - data[i - 1] * top) * B + data[i + W - 1]) \
                    % MOD
            if (h & MASK) == 0 and i + W < n:
                cuts.append(i + W)
    bounds = [0] + cuts + [n]
    return [data[a:b] for a, b in zip(bounds[:-1], bounds[1:])]


def test_cdc_chunk_dedup_matches_reference_chunker(ray_session):
    from collections import Counter

    got = R.q_cdc_chunk_dedup(SF).to_pandas().iloc[0]
    docs = T(SF, "documents", ["text"]).to_pandas()
    counts = Counter()
    lens = {}
    for txt in docs["text"]:
        data = txt.encode("utf-8", "surrogatepass")
        for ch in _cdc_chunks_ref(data):
            h = hashlib.md5(ch).hexdigest()
            counts[h] += 1
            lens[h] = len(ch)
    assert int(got["n_chunks"]) == sum(counts.values())
    assert int(got["n_distinct_chunks"]) == len(counts)
    assert int(got["bytes_total"]) == sum(
        counts[h] * lens[h] for h in counts)
    assert int(got["bytes_distinct"]) == sum(lens.values())


def test_cdc_shift_invariance_property():
    """The CDC point: inserting one byte near the front realigns only
    the chunks up to the next cut — most chunk hashes survive, unlike
    fixed-size chunking where everything after the edit shifts."""
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 256, 4096, dtype=np.uint8).tolist())
    edited = data[:10] + b"X" + data[10:]
    a = {bytes(c) for c in _cdc_chunks_ref(data)}
    b = {bytes(c) for c in _cdc_chunks_ref(edited)}
    shared = len(a & b)
    assert shared >= len(a) * 3 // 4  # ≥75 % of chunks survive

    # fixed-size chunking comparison: almost nothing survives
    fixed_a = {data[i:i + 64] for i in range(0, len(data), 64)}
    fixed_b = {edited[i:i + 64] for i in range(0, len(edited), 64)}
    assert len(fixed_a & fixed_b) <= 2


# ------------------------------------------------- convex hull


def test_convex_hull_matches_jarvis_march(ray_session):
    got = R.q_convex_hull(SF).to_pandas().sort_values("pos")
    hull = list(zip(got["x"].astype(int), got["y"].astype(int)))
    # rebuild the point cloud
    orders = T(SF, "orders", ["o_custkey", "o_totalprice"]).to_pandas()
    g = orders.groupby("o_custkey").agg(
        spend=("o_totalprice", "sum"), n=("o_totalprice", "size"))
    x = (np.floor(np.abs(g["spend"].to_numpy() * 100) + 0.5)
         ).astype(np.int64)
    pts = sorted(set(zip(x.tolist(), g["n"].astype(int).tolist())))
    # Jarvis march (gift wrapping) — an INDEPENDENT hull algorithm
    start = min(pts)
    cur, jarvis = start, []
    while True:
        jarvis.append(cur)
        cand = pts[0] if pts[0] != cur else pts[-1]
        for p in pts:
            if p == cur:
                continue
            cross = ((cand[0] - cur[0]) * (p[1] - cur[1])
                     - (cand[1] - cur[1]) * (p[0] - cur[0]))
            far = (abs(p[0] - cur[0]) + abs(p[1] - cur[1])
                   > abs(cand[0] - cur[0]) + abs(cand[1] - cur[1]))
            if cross < 0 or (cross == 0 and far):
                cand = p
        cur = cand
        if cur == start:
            break
    assert set(hull) == set(jarvis)
    assert len(hull) == len(jarvis)
    # every point inside-or-on each CCW edge
    arr = np.asarray(pts, np.int64)
    for i in range(len(hull)):
        ax, ay = hull[i]
        bx, by = hull[(i + 1) % len(hull)]
        cr = (bx - ax) * (arr[:, 1] - ay) - (by - ay) * (arr[:, 0] - ax)
        assert (cr >= 0).all()


# ------------------------------------------------- gamma index audit


def test_gamma_index_audit_matches_posting_replay(ray_session):
    got = R.q_gamma_index_audit(SF).to_pandas().iloc[0]
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    post: dict = {}
    for did, txt in zip(docs["doc_id"], docs["text"]):
        for t in set(R._TOKEN.findall(txt.lower())):
            post.setdefault(t, set()).add(int(did))

    def gb(x):
        return 2 * (int(x).bit_length() - 1) + 1

    bits = n_post = 0
    for t, ids in post.items():
        ids = sorted(ids)
        n_post += len(ids)
        bits += gb(ids[0] + 1)
        bits += sum(gb(b - a) for a, b in zip(ids[:-1], ids[1:]))
    assert int(got["n_terms"]) == len(post)
    assert int(got["n_postings"]) == n_post
    assert int(got["gamma_bits"]) == bits
    assert int(got["fixed32_bits"]) == 32 * n_post
    # gamma gap coding must actually compress vs fixed 32-bit
    assert int(got["gamma_bits"]) < int(got["fixed32_bits"])


# ------------------------------------------------- Simpson audit


def test_simpsons_paradox_audit_directions(ray_session):
    got = R.q_simpsons_paradox_audit(SF).to_pandas().iloc[0]
    # conservation: agree + oppose + tie = nations compared
    assert (int(got["n_agree"]) + int(got["n_oppose"])
            + int(got["n_tie"])) == int(got["n_nations"]) or \
        int(got["global_dir"]) == 0
    assert int(got["global_dir"]) in (-1, 0, 1)
    # full reversal only when every nation opposes a nonzero global
    if int(got["full_reversal"]):
        assert int(got["n_oppose"]) == int(got["n_nations"])
        assert int(got["global_dir"]) != 0
    # cross-multiplied construction of Simpson's classic: pooled
    # direction CAN differ from unanimous group direction
    # (2/8 vs 3/5 pooled with 1/5 vs 2/2 and 1/3 vs 1/3 groups)
    f1, n1, f2, n2 = 2, 8, 3, 5
    assert np.sign(f1 * n2 - f2 * n1) == -1
    ga = np.sign(1 * 2 - 2 * 5)
    gb = np.sign(1 * 3 - 1 * 3)
    assert (ga, gb) != (-1, -1)  # groups don't unanimously agree


# ------------------------------------------------- max coverage


def test_max_coverage_greedy_certificate_and_bruteforce(ray_session):
    import itertools

    got = R.q_max_coverage_greedy(SF).to_pandas().iloc[0]
    greedy, opt = int(got["greedy_coverage"]), int(got["opt_coverage"])
    assert greedy <= opt
    assert 27 * greedy >= 19 * opt  # NWF'78 bound, rational form
    # independent brute force over the shingle→source sets
    docs = T(SF, "documents", ["text", "source"]).to_pandas()
    srcs = sorted(docs["source"].unique())
    cover = {s: set() for s in srcs}
    for txt, src in zip(docs["text"], docs["source"]):
        toks = R._TOKEN.findall(txt.lower())
        cover[src].update(" ".join(toks[i:i + 3])
                          for i in range(len(toks) - 2))
    best = max(len(cover[a] | cover[b] | cover[c])
               for a, b, c in itertools.combinations(srcs, 3))
    assert opt == best
    total = len(set().union(*cover.values()))
    assert int(got["total_vocab"]) == total
    picks = got["picks"].split(",")
    assert len(set(picks)) == R.MAXCOV_K
    assert greedy == len(set().union(*(cover[p] for p in picks)))


# ------------------------------------------------- Little's law


def test_littles_law_audit_identity_and_peak(ray_session):
    got = R.q_littles_law_audit(SF).to_pandas().iloc[0]
    assert int(got["littles_law_holds"]) == 1
    assert int(got["duration_sum_s"]) == int(got["sweep_integral_s"])
    # independent sweep replay
    ev = T(SF, "events", ["event_id", "ts"]).to_pandas()
    t = ev["ts"].to_numpy().astype("datetime64[us]").view("int64")
    s = (t // (R.ALLEN_GRID_S * 1_000_000)) * R.ALLEN_GRID_S
    e = s + (ev["event_id"].to_numpy(np.int64)
             % R.ALLEN_DUR_STEPS + 1) * 60
    deltas: dict = {}
    for a, b in zip(s, e):
        deltas[int(a)] = deltas.get(int(a), 0) + 1
        deltas[int(b)] = deltas.get(int(b), 0) - 1
    ts = sorted(deltas)
    conc, peak, area = 0, 0, 0
    for i, tt in enumerate(ts):
        conc += deltas[tt]
        peak = max(peak, conc)
        if i + 1 < len(ts):
            area += conc * (ts[i + 1] - tt)
    assert int(got["peak_concurrency"]) == peak
    assert int(got["sweep_integral_s"]) == area
    assert area == int((e - s).sum())


# ------------------------------------------------- cuckoo self-audit


def test_cuckoo_fpr_audit_and_saturation(ray_session):
    got = R.q_cuckoo_fpr_audit(SF).to_pandas().iloc[0]
    assert int(got["n_flagged"]) >= int(got["n_present"])
    assert int(got["n_false_pos"]) == \
        int(got["n_flagged"]) - int(got["n_present"])
    # saturation drive: fill a tiny filter past kick chains and
    # verify the no-false-negative guarantee holds throughout
    from fide_crawler_ray.state.cuckoo import (CuckooFilter,
                                               sha1_bytes_to_array)
    cf = CuckooFilter(capacity=1 << 8)
    keys = [hashlib.sha1(f"sat,{i}".encode()).digest()
            for i in range(300)]
    arr = sha1_bytes_to_array(keys)
    cf.insert_batch(arr)
    assert bool(cf.contains_batch(arr).all())
    # and an FPR measurably > 0 under load on fresh probes
    fresh = sha1_bytes_to_array(
        [hashlib.sha1(f"fresh,{i}".encode()).digest()
         for i in range(5000)])
    fpr = float(cf.contains_batch(fresh).mean())
    assert 0 <= fpr < 0.2


# ------------------------------------------------- BWT audit


def test_bwt_roundtrip_and_known_vector():
    # classic vector: 'banana' rotations sort → BWT 'nnbaaa', idx 3
    last, idx = R._bwt(b"banana")
    assert last == b"nnbaaa"
    assert R._ibwt(last, idx) == b"banana"
    # roundtrip on arbitrary bytes incl. repeats and unicode
    for s in (b"abracadabra", "héllo wörld déjà".encode(),
              b"aaaaabbbbb", b"x"):
        l2, i2 = R._bwt(s)
        assert R._ibwt(l2, i2) == s


def test_bwt_audit_concentrates_runs(ray_session):
    got = R.q_bwt_audit(SF).to_pandas()
    # the transform must concentrate context: fewer runs after BWT
    assert (got["runs_bwt"] < got["runs_raw"]).all()
    assert (got["run_ratio_fp"] < 1_000_000).all()
    # replay one source's totals
    docs = T(SF, "documents", ["text", "source"]).to_pandas()
    src = got["source"].iloc[0]
    sub = docs[docs["source"] == src]
    r0 = r1 = nb = 0
    for txt in sub["text"]:
        data = txt.encode("utf-8", "surrogatepass")
        last, idx = R._bwt(data)
        r0 += R._rle_runs(data)
        r1 += R._rle_runs(last)
        nb += len(data)
    row = got[got["source"] == src].iloc[0]
    assert (int(row["runs_raw"]), int(row["runs_bwt"]),
            int(row["n_bytes"])) == (r0, r1, nb)


# ------------------------------------------------- Naive Bayes


def test_naive_bayes_eval_matches_bigint_replay(ray_session):
    from collections import Counter

    got = R.q_naive_bayes_eval(SF).to_pandas() \
        .set_index("true_class")
    docs = T(SF, "documents", ["doc_id", "text", "source"]).to_pandas()
    s1, s2 = sorted(docs["source"].unique())[:2]
    m1, m2 = Counter(), Counter()
    p1 = p2 = 0
    test_rows = []
    for did, txt, src in zip(docs["doc_id"], docs["text"],
                             docs["source"]):
        if src not in (s1, s2):
            continue
        ts = R._TOKEN.findall(txt.lower())
        if int(hashlib.md5(f"nb,{did}".encode())
               .hexdigest()[:2], 16) % 2 == 0:
            if src == s1:
                p1 += 1
                m1.update(ts)
            else:
                p2 += 1
                m2.update(ts)
        else:
            test_rows.append((ts, src))
    vocab = set(m1) | set(m2)
    t1, t2, v = sum(m1.values()), sum(m2.values()), len(vocab)
    want = {s1: [0, 0], s2: [0, 0]}
    for ts, src in test_rows:
        prod1, prod2 = p1, p2
        for t in ts:
            prod1 *= m1.get(t, 0) + 1
            prod2 *= m2.get(t, 0) + 1
        pred = s1 if prod1 * (t2 + v) ** len(ts) \
            >= prod2 * (t1 + v) ** len(ts) else s2
        want[src][0] += 1
        want[src][1] += pred == src
    for cls in (s1, s2):
        row = got.loc[cls]
        assert int(row["n_test"]) == want[cls][0]
        assert int(row["n_correct"]) == want[cls][1]
        assert 0 <= int(row["accuracy_fp"]) <= 1_000_000
