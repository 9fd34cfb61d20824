"""r4 session ops: oracle-backed near-dup survivors (brute-force
equality preconditions), deterministic hash sampling, md5 rolling
fingerprints, and the M17 dp-table query."""

import hashlib
import itertools

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _comps_survivors(ids, pairs):
    from fide_crawler_ray.functions import sketches as SK

    uf = SK.UnionFind()
    for a, b in pairs:
        uf.union(a, b)
    dropped = {x for x, r in uf.groups().items() if r != x}
    return sorted(set(ids) - dropped)


def _docs():
    d = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    return d["doc_id"].tolist(), dict(zip(d["doc_id"], d["text"]))


def test_minhash_survivors_equal_bruteforce(ray_session):
    """The dedup_minhash oracle's precondition: LSH candidate recall is
    1.0 over truly-similar pairs on the gate corpus, so survivors ==
    brute-force exact-Jaccard components. If testdata or the LSH
    parameters drift, this catches it before the driver does."""
    from fide_crawler_ray.functions import sketches as SK
    from fide_crawler_ray.pipelines import dedup_text as DT
    from fide_crawler_ray.pipelines.queries import T

    ids, texts = _docs()
    sh = {i: set(SK.shingles(texts[i], 3)) for i in ids}
    pairs = [(a, b) for a, b in itertools.combinations(sorted(ids), 2)
             if sh[a] and sh[b]
             and len(sh[a] & sh[b]) * 10 >= len(sh[a] | sh[b]) * 7]
    bf = _comps_survivors(ids, pairs)
    surv, _ = DT.minhash_lsh_dedup(
        T(SF, "documents", ["doc_id", "text"]), threshold=0.7)
    got = sorted(r["doc_id"] for r in surv.select_columns(["doc_id"])
                 .take_all())
    assert got == bf


def test_simhash_survivors_equal_bruteforce(ray_session):
    """4 bands × 16 bits give EXACT recall for hamming ≤ 3 (pigeonhole),
    so simhash survivors are a pure function of the md5-derived simhash
    values — the dedup_simhash oracle replays exactly this."""
    from fide_crawler_ray.functions import sketches as SK
    from fide_crawler_ray.pipelines import dedup_text as DT
    from fide_crawler_ray.pipelines.queries import T

    ids, texts = _docs()
    hs = {i: SK.simhash64(texts[i]) for i in ids}
    pairs = [(a, b) for a, b in itertools.combinations(sorted(ids), 2)
             if SK.hamming64(hs[a], hs[b]) <= 3]
    bf = _comps_survivors(ids, pairs)
    surv, _ = DT.simhash_dedup(
        T(SF, "documents", ["doc_id", "text"]), max_hamming=3)
    got = sorted(r["doc_id"] for r in surv.select_columns(["doc_id"])
                 .take_all())
    assert got == bf


def test_simhash_token_hash_is_md5_derived():
    """The SQL oracle computes token hashes as the first 16 hex chars of
    md5 — sketches.md5_hash64 must match that formula exactly."""
    from fide_crawler_ray.functions.sketches import md5_hash64

    words = ["hello", "würld", "a", ""]
    got = md5_hash64(words)
    want = [int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
            for w in words]
    assert got.tolist() == want


def test_rolling_fp_matches_scalar_spec():
    """fingerprint_batch's roll_fp == the scalar Rabin-Karp spec over
    md5-derived word hashes (the list_reduce oracle's formula)."""
    import pyarrow as pa

    from fide_crawler_ray.functions.textstats import fingerprint_batch

    texts = ["Hello   World", "hello world", "one two  three", ""]
    out = fingerprint_batch(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    MOD, B = (1 << 61) - 1, 1000003
    for txt, got in zip(texts, out["roll_fp"].to_pylist()):
        norm = " ".join(txt.lower().split())
        h = 0
        for w in norm.split(" "):
            h = (h * B + int(hashlib.md5(w.encode()).hexdigest()[:16],
                             16)) % MOD
        assert got == h
    assert out["roll_fp"][0].as_py() == out["roll_fp"][1].as_py()


def test_random_sample_deterministic_hash(ray_session):
    """q_random_sample keeps exactly the rows whose md5 prefix is
    00/01/02 — stable across runs and block layouts, ~1.2% of rows."""
    from fide_crawler_ray.pipelines.queries import q_random_sample

    a = q_random_sample(SF).to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    b = q_random_sample(SF).to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    total = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
    assert 0.004 * total < len(a) < 0.025 * total
    for _, r in a.head(20).iterrows():
        hx = hashlib.md5(
            f"{int(r.l_orderkey)},{int(r.l_linenumber)}".encode()
        ).hexdigest()[:2]
        assert hx in ("00", "01", "02")


def test_perf_rating_dp_matches_local_recompute(ray_session):
    """q_perf_rating_dp == a driver-side pandas recompute feeding the
    same rating_performance function — n is always 8..11 so every row
    exercises the dp-table path with integer-exact output."""
    from fide_crawler_ray.functions.perf_rating import rating_performance
    from fide_crawler_ray.pipelines.queries import q_perf_rating_dp

    got = q_perf_rating_dp(SF).to_pandas().sort_values(
        "suppkey").reset_index(drop=True)
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    ).to_pandas()
    rows = []
    for sk, g in li.groupby("l_suppkey"):
        g = g.sort_values(["l_orderkey", "l_linenumber"],
                          kind="mergesort").head(8 + int(sk) % 4)
        res = ((g["l_orderkey"] + g["l_linenumber"]) % 3) / 2.0
        opp = 1500 + (g["l_partkey"] % 800)
        n, rs = len(g), int(opp.sum())
        avg = (2 * rs + n) // (2 * n)
        perf = rating_performance(
            np.array([n]), np.array([res.sum()]),
            np.array([avg], dtype=np.float64), np.array([rs]),
            np.array([(res == 1.0).sum()]),
            np.array([(res == 0.0).sum()]))
        rows.append((int(sk), n, int(round(res.sum() * 2)), rs, avg,
                     int(perf[0])))
    want = pd.DataFrame(rows, columns=["suppkey", "n_games", "points_x2",
                                       "rating_sum", "avg_opp", "perf"])
    assert (got["n_games"].between(8, 11)).all()
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64"))


def test_jpeg_pixel_stats_closed_form(ray_session):
    """q_jpeg_pixel_stats channel sums == md5 closed form (the DuckDB
    oracle's arithmetic) — certifies the real encode→decode round trip
    on every document."""
    from fide_crawler_ray.pipelines.queries import (JPEG_DIM_H,
                                                    JPEG_DIM_W,
                                                    q_jpeg_pixel_stats)

    got = q_jpeg_pixel_stats(SF).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    n = JPEG_DIM_W * JPEG_DIM_H
    for _, r in got.head(40).iterrows():
        d = hashlib.md5(f"jpg,{int(r.doc_id)}".encode()).digest()
        assert (r.r_sum, r.g_sum, r.b_sum) == \
            (d[0] * n, d[1] * n, d[2] * n)
        assert (r.width, r.height) == (JPEG_DIM_W, JPEG_DIM_H)
