"""Corpus-hygiene tier (pipelines/textclean.py): PII scrub, quality
gates, repetition, source mixing, vocabulary pruning. The DuckDB parity
of each op is covered by the oracle gate (tools/check_oracles.py); these
tests pin the properties the oracles can't express — fallback-path
equivalence, determinism, and redaction completeness."""

import re

import pandas as pd

from fide_crawler_ray.pipelines import textclean as TC

SF = "/root/testdata/sf0.001"


def _df(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_pii_scrub_redacts_everything():
    out = _df(TC.q_pii_scrub(SF))
    # the augmentation injects exactly one email, one IP, one phone
    assert (out["n_emails"] == 1).all()
    assert (out["n_ips"] == 1).all()
    assert (out["n_phones"] == 1).all()
    pat = re.compile(f"{TC._EMAIL}|{TC._IP}|{TC._PHONE}")
    assert not out["clean_text"].str.contains(pat, regex=True).any()
    assert out["clean_text"].str.contains("<EMAIL>", regex=False).all()


def test_quality_gopher_matches_pandas():
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = _df(TC.q_quality_gopher(SF)).set_index("doc_id")
    for _, r in docs.iterrows():
        ws = r["text"].split(" ")
        n, d = len(ws), len(set(ws))
        nosp = len(r["text"].replace(" ", ""))
        got = out.loc[r["doc_id"]]
        assert got["n_words"] == n
        exp_keep = (20 <= n <= 90 and 4 * n <= nosp <= 5 * n
                    and (n - d) * 10 <= 6 * n)
        assert bool(got["keep"]) == exp_keep, r["doc_id"]


def test_mix_sources_deterministic_and_weighted():
    a = _df(TC.q_mix_sources(SF))
    b = _df(TC.q_mix_sources(SF))
    pd.testing.assert_frame_equal(a, b)
    # weight-1.0 sources (idx % 4 == 0) keep every document
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    full = docs[docs["source"].str[3:].astype(int) % 4 == 0]
    kept_full = a[a["source"].str[3:].astype(int) % 4 == 0]
    assert len(kept_full) == len(full)
    # fractional sources keep a strict, non-empty subset overall
    assert 0 < len(a) < len(docs)


def test_vocab_prune_join_fallback_identical():
    fast = _df(TC.q_vocab_prune(SF))
    slow = _df(TC.q_vocab_prune(SF, max_broadcast_vocab=0))
    pd.testing.assert_frame_equal(fast, slow)
    # pruning did something, and reassembly preserved word order
    assert (fast["n_dropped"] > 0).any()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    merged = fast.merge(docs[["doc_id", "text"]], on="doc_id")
    for _, r in merged.head(25).iterrows():
        orig = r["text"].split(" ")
        kept = r["clean_text"].split(" ") if r["clean_text"] else []
        it = iter(orig)
        assert all(any(w == o for o in it) for w in kept), r["doc_id"]
