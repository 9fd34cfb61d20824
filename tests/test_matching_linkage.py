"""Matching & linkage operators: reciprocal best match, golden-record
survivorship, Fellegi–Sunter blocked linkage, DBSCAN density profile,
Gale–Shapley stable matching. Oracle parity for the first four is the
driver gate's job; these tests replay each computation brute-force in
plain pandas/python at sf0.001 and pin the stable-matching invariants
(no blocking pair + exact replay) that SQL cannot express."""

import numpy as np
import pandas as pd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


def test_reciprocal_best_match_brute_force():
    got = (R.q_reciprocal_best_match(SF).to_pandas()
           .sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True))
    li = T(SF, "lineitem",
           ["l_partkey", "l_suppkey", "l_extendedprice"]).to_pandas()
    li["price_fp"] = R._round_half_away(
        li["l_extendedprice"].to_numpy() * 100.0).astype(np.int64)
    ps = (li.groupby(["l_partkey", "l_suppkey"], as_index=False)["price_fp"]
            .min())
    bp = (ps.sort_values(["price_fp", "l_suppkey"], kind="mergesort")
            .groupby("l_partkey", as_index=False).head(1))
    bs = (ps.sort_values(["price_fp", "l_partkey"], kind="mergesort")
            .groupby("l_suppkey", as_index=False).head(1))
    exp = (bp.merge(bs[["l_partkey", "l_suppkey"]],
                    on=["l_partkey", "l_suppkey"])
             .sort_values(["l_partkey", "l_suppkey"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["l_partkey", "l_suppkey", "price_fp"]],
        exp[["l_partkey", "l_suppkey", "price_fp"]], check_dtype=False)


def test_reciprocal_best_match_is_mutual():
    got = R.q_reciprocal_best_match(SF).to_pandas()
    # mutuality implies injectivity both ways: each part and each
    # supplier appears at most once in the matched edge set
    assert got["l_partkey"].is_unique
    assert got["l_suppkey"].is_unique


def test_golden_record_brute_force():
    got = (R.q_golden_record(SF).to_pandas()
           .sort_values("custkey").reset_index(drop=True))
    o = T(SF, "orders", ["o_custkey", "o_orderkey", "o_orderdate",
                         "o_orderstatus", "o_totalprice",
                         "o_orderpriority"]).to_pandas()
    o = o.sort_values(["o_orderdate", "o_orderkey"],
                      ascending=False, kind="mergesort")
    f = (o[o["o_orderstatus"] == "F"]
         .groupby("o_custkey")["o_orderpriority"].first())
    op = o[o["o_orderstatus"] == "O"].copy()
    op["fp"] = R._round_half_away(
        op["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    p = op.groupby("o_custkey")["fp"].first()
    n = o.groupby("o_custkey").size()
    exp = pd.DataFrame({
        "custkey": n.index, "n_src": n.values,
        "prio_final": f.reindex(n.index).values,
        "open_price_fp": p.reindex(n.index).values,
    }).sort_values("custkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_fellegi_sunter_scores_and_block():
    got = R.q_fellegi_sunter(SF).to_pandas()
    c = T(SF, "customer",
          ["c_custkey", "c_nationkey", "c_acctbal"]).to_pandas()
    s = T(SF, "supplier",
          ["s_suppkey", "s_nationkey", "s_acctbal"]).to_pandas()
    x = c.merge(s, left_on="c_nationkey", right_on="s_nationkey")

    def band(bal):
        return ((R._round_half_away(bal.to_numpy() * 100.0).astype(np.int64)
                 + 1_000_000) // 100_000)

    sc = (np.where((x["c_acctbal"] >= 0) == (x["s_acctbal"] >= 0),
                   R.FS_W_SIGN_A, R.FS_W_SIGN_D)
          + np.where(x["c_custkey"] % 100 == x["s_suppkey"] % 100,
                     R.FS_W_SUFFIX_A, R.FS_W_SUFFIX_D)
          + np.where(band(x["c_acctbal"]) == band(x["s_acctbal"]),
                     R.FS_W_LENBAND_A, R.FS_W_LENBAND_D))
    exp = (x.loc[sc >= R.FS_THRESHOLD, ["c_custkey", "s_suppkey"]]
            .assign(score=sc[sc >= R.FS_THRESHOLD])
            .sort_values(["c_custkey", "s_suppkey"]).reset_index(drop=True))
    got = (got.sort_values(["c_custkey", "s_suppkey"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every retained pair respects the blocking key
    nk_c = c.set_index("c_custkey")["c_nationkey"]
    nk_s = s.set_index("s_suppkey")["s_nationkey"]
    assert (nk_c.loc[got["c_custkey"]].to_numpy()
            == nk_s.loc[got["s_suppkey"]].to_numpy()).all()


def test_dbscan_core_brute_force():
    got = (R.q_dbscan_core(SF).to_pandas()
           .sort_values("custkey").reset_index(drop=True))
    k = T(SF, "customer", ["c_custkey"]).to_pandas()[
        "c_custkey"].to_numpy().astype(np.int64)
    x, y = R._geo_xy(k, 0, 0)
    d2 = ((x[:, None] - x[None, :]) ** 2
          + (y[:, None] - y[None, :]) ** 2)
    near = (d2 <= R.DBSCAN_EPS ** 2)
    np.fill_diagonal(near, False)
    n = near.sum(axis=1).astype(np.int64)
    order = np.argsort(k)
    exp = pd.DataFrame({
        "custkey": k[order], "n_neighbors": n[order],
        "is_core": (n[order] >= R.DBSCAN_MINPTS),
    }).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def _sm_markets():
    c = T(SF, "customer", ["c_custkey", "c_nationkey"]).to_pandas()
    s = T(SF, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
    return c, s


def test_stable_matching_no_blocking_pair():
    got = R.q_stable_matching(SF).to_pandas()
    c, s = _sm_markets()
    match_of_c = dict(zip(got["custkey"], got["suppkey"]))
    held = got.groupby("suppkey")["custkey"].apply(list).to_dict()
    for nation, cg in c.groupby("c_nationkey"):
        ss = sorted(s.loc[s["s_nationkey"] == nation, "s_suppkey"])
        if not ss:
            continue
        for ck in cg["c_custkey"]:
            ck = int(ck)
            my = match_of_c.get(ck)
            my_rank = (R._sm_score(ck, my, "c"), -my) if my is not None \
                else None
            for sk in ss:
                if sk == my:
                    continue
                pref_s = (R._sm_score(ck, sk, "c"), -sk)
                # customer prefers sk over current match (or is unmatched)?
                if my_rank is not None and pref_s <= my_rank:
                    continue
                h = held.get(sk, [])
                if len(h) < R.SM_CAP:
                    raise AssertionError(
                        f"blocking pair ({ck},{sk}): supplier has room")
                worst = min((R._sm_score(sk, x, "s"), -x) for x in h)
                assert (R._sm_score(sk, ck, "s"), -ck) < worst, \
                    f"blocking pair ({ck},{sk}): supplier prefers {ck}"


def test_stable_matching_replay_and_caps():
    got = (R.q_stable_matching(SF).to_pandas()
           .sort_values(["nation", "custkey"]).reset_index(drop=True))
    c, s = _sm_markets()
    rows = []
    for nation in sorted(set(c["c_nationkey"]) | set(s["s_nationkey"])):
        cs = sorted(int(v) for v in
                    c.loc[c["c_nationkey"] == nation, "c_custkey"])
        ss = sorted(int(v) for v in
                    s.loc[s["s_nationkey"] == nation, "s_suppkey"])
        if not cs or not ss:
            continue
        for ck, sk, r in R._gale_shapley_market(cs, ss, R.SM_CAP):
            rows.append((int(nation), ck, sk, r))
    exp = pd.DataFrame(rows, columns=["nation", "custkey", "suppkey",
                                      "cust_rank"])
    exp = exp.sort_values(["nation", "custkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.groupby("suppkey").size().max() <= R.SM_CAP
    assert got["custkey"].is_unique
    assert got["cust_rank"].ge(1).all()
