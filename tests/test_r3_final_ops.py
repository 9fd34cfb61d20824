"""Final round-3 operators: int8 quantization, skip-gram pairs,
permutation test, KMV, oversampling, KWIC, group-aware split, LF audit,
paired diversity, k-center coreset, Wasserstein-1. Oracle parity is the
driver gate's job; these tests replay each computation brute-force in
plain numpy/python at sf0.001 and pin the structural invariants."""

import hashlib

import numpy as np
import pandas as pd

from fide_crawler_ray.pipelines import relational as R
from fide_crawler_ray.pipelines.queries import T

SF = "/root/testdata/sf0.001"


def _md5_60(s) -> int:
    return int(hashlib.md5(str(s).encode()).hexdigest()[:15], 16)


def test_int8_quant_error_bounded_by_scale():
    got = R.q_int8_quant_audit(SF).to_pandas()
    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas()
    xfp = np.array([R._round_half_away(
        np.asarray(v, dtype=np.float64) * 1e6)
        for v in emb["embedding"]]).astype(np.int64)
    m = np.abs(xfp).max(axis=0)
    # per-element error of floor((254x+m)/2m) is at most m (half a
    # quantization step in the 127x domain, plus the floor offset)
    assert (got["max_err"] <= int(m.max())).all()
    assert (got["n_dims"] == xfp.shape[1]).all()
    # exact replay for the first 5 vectors
    sub = got.set_index("vec_id").sort_index()
    for i in range(5):
        q = np.where(m == 0, 0,
                     (254 * xfp[i] + m) // (2 * np.maximum(m, 1)))
        err = np.abs(127 * xfp[i] - q * m)
        vid = int(emb["vec_id"].iloc[i])
        assert sub.loc[vid, "max_err"] == err.max()
        assert sub.loc[vid, "sum_err"] == err.sum()


def test_skipgram_pairs_symmetric_counts():
    got = R.q_skipgram_pairs(SF).to_pandas()
    fwd = got.set_index(["center", "context"])["n_pairs"]
    rev = got.set_index(["context", "center"])["n_pairs"]
    rev.index.names = ["center", "context"]
    pd.testing.assert_series_equal(fwd.sort_index(), rev.sort_index(),
                                   check_names=False)
    assert (got["n_pairs"] >= 1).all()


def test_permutation_test_brute_force_replay():
    got = R.q_permutation_test(SF)
    ev = T(SF, "events", ["event_id", "event_type", "value"]).to_pandas()
    vf = R._round_half_away(ev["value"].to_numpy() * 1e6).astype(np.int64)
    g = (ev["event_type"] == "click").to_numpy()
    h = np.array([_md5_60(int(i)) for i in ev["event_id"]])
    s, n = int(vf.sum()), len(vf)
    s1, n1 = int(vf[g].sum()), int(g.sum())
    d_obs = abs(s1 * (n - n1) - (s - s1) * n1)
    q_obs = n1 * (n - n1)
    p_num = p_den = 0
    for p in range(R.PERM_TEST_BITS):
        bit = ((h >> p) & 1).astype(bool)
        np_ = int(bit.sum())
        if np_ in (0, n):
            continue
        p_den += 1
        sp = int(vf[bit].sum())
        dp = abs(sp * (n - np_) - (s - sp) * np_)
        if dp * q_obs >= d_obs * (np_ * (n - np_)):
            p_num += 1
    assert int(got["p_num"].iloc[0]) == p_num
    assert int(got["p_den"].iloc[0]) == p_den
    assert int(got["n"].iloc[0]) == n


def test_kmv_matches_brute_force():
    got = R.q_kmv_distinct(SF).set_index("event_type")
    ev = T(SF, "events", ["event_type", "user_id"]).to_pandas()
    for et, g in ev.groupby("event_type"):
        hs = np.unique([_md5_60(int(u)) for u in g["user_id"].unique()])
        if len(hs) < R.KMV_K:
            assert et not in got.index
            continue
        hk = int(np.sort(hs)[R.KMV_K - 1])
        assert got.loc[et, "hk"] == hk
        assert got.loc[et, "est"] == (R.KMV_K - 1) * (1 << 60) // hk


def test_oversample_ledger_replay():
    got = R.q_oversample_balance(SF).to_pandas().set_index("lang")
    docs = T(SF, "documents", ["doc_id", "lang"]).to_pandas()
    cnt = docs.groupby("lang").size().to_dict()
    m = max(cnt.values())
    for lang, n in cnt.items():
        thr = ((m % n) * (1 << 60) + n - 1) // n
        extra = sum(1 for d in docs.loc[docs["lang"] == lang, "doc_id"]
                    if _md5_60(int(d)) < thr)
        assert got.loc[lang, "n_after"] == (m // n) * n + extra
        assert got.loc[lang, "n_before"] == n
        assert got.loc[lang, "target"] == m
    # majority class is untouched
    maj = max(cnt, key=lambda k: cnt[k])
    assert got.loc[maj, "n_after"] == cnt[maj]


def test_kwic_replays_first_occurrence():
    got = R.q_kwic_snippets(SF).to_pandas().set_index("doc_id")
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    hits = 0
    for _, row in docs.iterrows():
        toks = row["text"].split(" ")
        if R.KWIC_TERM not in toks:
            assert row["doc_id"] not in got.index
            continue
        hits += 1
        i = toks.index(R.KWIC_TERM)
        win = toks[max(0, i - R.KWIC_HALO): i + R.KWIC_HALO + 1]
        fp = int(hashlib.md5(" ".join(win).encode()).hexdigest()[:15], 16)
        assert got.loc[row["doc_id"], "idx"] == i + 1
        assert got.loc[row["doc_id"], "snippet_fp"] == fp
    assert hits == len(got)


def test_group_aware_split_partitions_everything():
    got = R.q_group_aware_split(SF)
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    assert int(got["n_docs"].sum()) == len(docs)
    n_clusters = docs["text"].map(
        lambda t: hashlib.md5(t.encode()).hexdigest()).nunique()
    assert int(got["n_clusters"].sum()) == n_clusters


def test_labeling_functions_brute_force():
    got = R.q_labeling_functions_audit(SF).to_pandas().set_index("lf")
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    votes = []
    for t in docs["text"]:
        s = set(t.split(" "))
        votes.append([1 if "fast" in s else -1,
                      0 if "slow" in s else -1,
                      1 if "merge" in s else -1])
    v = np.array(votes)
    names = ["lf_fast", "lf_slow", "lf_merge"]
    for j, nm in enumerate(names):
        mine = v[:, j] >= 0
        others = [k for k in range(3) if k != j]
        any_other = (v[:, others] >= 0).any(axis=1)
        conf = np.zeros(len(v), dtype=bool)
        for k in others:
            conf |= mine & (v[:, k] >= 0) & (v[:, k] != v[:, j])
        assert got.loc[nm, "coverage"] == mine.sum()
        assert got.loc[nm, "overlap"] == (mine & any_other).sum()
        assert got.loc[nm, "conflict"] == conf.sum()
    npos = (v == 1).sum(axis=1)
    nneg = (v == 0).sum(axis=1)
    maj = np.where(npos > nneg, 1, np.where(nneg > npos, 0, -1))
    assert got.loc["vote_1", "coverage"] == (maj == 1).sum()
    assert got.loc["vote_0", "coverage"] == (maj == 0).sum()
    assert got.loc["abstain", "coverage"] == (maj == -1).sum()


def test_paired_diversity_brute_force():
    got = R.q_paired_diversity(SF).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    docs = T(SF, "documents", ["doc_id", "text"]).to_pandas()
    docs["hk"] = docs["doc_id"].map(
        lambda d: hashlib.md5(str(int(d)).encode()).hexdigest())
    srt = docs.sort_values(["hk", "doc_id"]).reset_index(drop=True)
    assert len(got) == len(docs) // 2
    texts = dict(zip(docs["doc_id"], docs["text"]))
    for i in range(0, (len(srt) // 2) * 2, 2):
        a, b = int(srt["doc_id"].iloc[i]), int(srt["doc_id"].iloc[i + 1])
        row = got.iloc[i // 2]
        assert (row["doc_a"], row["doc_b"]) == (a, b)
        sa, sb = set(texts[a].split(" ")), set(texts[b].split(" "))
        assert row["jac_fp"] == len(sa & sb) * 10**9 // len(sa | sb)


def test_kcenter_matches_brute_force_greedy():
    got = R.q_kcenter_coreset(SF)
    emb = T(SF, "embeddings", ["vec_id", "embedding"]).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    x = np.array([R._round_half_away(
        np.asarray(v, dtype=np.float64) * 1e6)
        for v in emb["embedding"]]).astype(np.int64)
    ids = emb["vec_id"].to_numpy(np.int64)
    c0 = int(ids.min())
    dmin = ((x - x[ids == c0][0]) ** 2).sum(axis=1)
    expect = [(1, c0, 0)]
    for step in range(2, R.KCENTER_K + 1):
        order = np.lexsort((ids, -dmin))
        j = order[0]
        expect.append((step, int(ids[j]), int(dmin[j])))
        dmin = np.minimum(dmin, ((x - x[j]) ** 2).sum(axis=1))
    assert list(map(tuple, got[["step", "center_id", "gain_fp"]]
                    .itertuples(index=False))) == expect
    # gains are non-increasing (submodularity of the greedy trajectory)
    gains = got["gain_fp"].to_numpy()[1:]
    assert (gains[:-1] >= gains[1:]).all()


def test_wasserstein_replay():
    got = R.q_wasserstein_1d(SF)
    docs = T(SF, "documents", ["lang", "n_chars"]).to_pandas()
    a = (docs.loc[docs["lang"] == "en", "n_chars"]
         // R.W1_BUCKET).value_counts()
    b = (docs.loc[docs["lang"] != "en", "n_chars"]
         // R.W1_BUCKET).value_counts()
    na, nb = int(a.sum()), int(b.sum())
    mx = int(max(a.index.max(), b.index.max()))
    ca = cb = 0
    num = 0
    for k in range(mx + 1):
        ca += int(a.get(k, 0))
        cb += int(b.get(k, 0))
        num += abs(ca * nb - cb * na)
    assert int(got["w1_num"].iloc[0]) == num * R.W1_BUCKET
    assert int(got["w1_den"].iloc[0]) == na * nb
