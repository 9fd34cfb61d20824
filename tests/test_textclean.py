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


def test_span_dedup_join_fallback_identical_and_brute_force():
    fast = _df(TC.q_span_dedup(SF))
    slow = _df(TC.q_span_dedup(SF, max_broadcast_dups=0))
    pd.testing.assert_frame_equal(fast, slow)

    # brute-force recomputation in plain Python over the same corpus
    import hashlib
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    w = TC.SPAN_W
    cnt: Counter = Counter()
    docset: defaultdict = defaultdict(set)
    per_doc: dict = {}
    for _, r in docs.iterrows():
        ts = r["text"].split(" ")
        hs = [hashlib.md5(" ".join(ts[i:i + w]).encode()).hexdigest()
              for i in range(len(ts) - w + 1)]
        per_doc[r["doc_id"]] = hs
        for h in hs:
            cnt[h] += 1
            docset[h].add(r["doc_id"])
    got = fast.set_index("doc_id")
    assert len(got) == sum(1 for hs in per_doc.values() if hs)
    for did, hs in per_doc.items():
        if not hs:
            assert did not in got.index
            continue
        nd = sum(1 for h in hs if cnt[h] >= 2)
        nc = sum(1 for h in hs if len(docset[h]) >= 2)
        row = got.loc[did]
        assert row["n_windows"] == len(hs)
        assert row["n_dup_windows"] == nd, did
        assert row["n_crossdoc_windows"] == nc, did
        assert bool(row["keep"]) == (2 * nc < len(hs))


def test_span_dedup_flags_partial_copy():
    """A doc that copies a long span from another doc is flagged even
    though the docs are not whole-doc duplicates."""
    import ray.data as rd

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi".split())
    donor = " ".join(base)
    thief = " ".join(base[:12] + ["unique", "tail", "words", "here"])
    clean = " ".join(f"tok{i}" for i in range(16))
    tbl = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [donor, thief, clean],
    })
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        rd.from_pandas(tbl).write_parquet(os.path.join(td, "documents.parquet"))
        out = _df(TC.q_span_dedup(td))
    out = out.set_index("doc_id")
    # thief shares its first 12 tokens with donor → 5 cross-doc windows
    assert out.loc[1, "n_crossdoc_windows"] == 5
    assert out.loc[0, "n_crossdoc_windows"] == 5
    assert out.loc[2, "n_crossdoc_windows"] == 0
    assert bool(out.loc[2, "keep"])
    # thief has 9 windows, 5 cross-doc → dropped; donor same
    assert not bool(out.loc[1, "keep"])


def test_chunk_documents_reconstruction():
    """Chunk invariants: stride-overlap reconstruction gives back the
    original token stream; every chunk except possibly the last is
    full-size; no chunk is contained in its predecessor."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = _df(TC.q_chunk_documents(SF)).sort_values(["doc_id", "chunk_idx"])
    size, stride = TC.CHUNK_SIZE, TC.CHUNK_STRIDE
    for _, r in docs.iterrows():
        ch = out[out["doc_id"] == r["doc_id"]]
        assert list(ch["chunk_idx"]) == list(range(len(ch)))
        toks = r["text"].split(" ")
        rebuilt = []
        for i, (_, row) in enumerate(ch.iterrows()):
            w = row["chunk"].split(" ") if row["chunk"] else [""]
            assert len(w) == row["n_tokens"]
            assert len(w) > size - stride or len(ch) == 1
            rebuilt.extend(w if i == 0 else w[size - stride:])
        assert rebuilt == toks, r["doc_id"]


def test_curation_pipeline_attrition_and_consistency():
    """The end-to-end curation chain: monotone attrition, split counts
    partition the final corpus, and the first two stages match their
    standalone operators' keep sets."""
    import numpy as np

    from fide_crawler_ray.pipelines import textclean as TC
    from fide_crawler_ray.pipelines.queries import T, q_text_langid

    out = TC.q_curation_pipeline(SF)
    body = out[~out["stage"].str.startswith("split:")]
    assert (body["rows_out"] <= body["rows_in"]).all()
    # chained: each stage's rows_in equals the previous stage's rows_out
    ro = body["rows_out"].tolist()
    ri = body["rows_in"].tolist()
    assert ri[1:] == ro[:-1]
    splits = out[out["stage"].str.startswith("split:")]
    assert splits["rows_out"].sum() == ro[-1]
    # stage-1 survivor count == standalone langid agreement count
    pred = q_text_langid(SF).to_pandas().set_index("doc_id")["lang_pred"]
    docs = T(SF, "documents", ["doc_id", "lang"]).to_pandas()
    n_agree = int((docs.set_index("doc_id")["lang"] == pred).sum())
    assert body.iloc[1]["rows_out"] == n_agree


def test_dsir_weights_separate_target_from_rest():
    """DSIR's defining property: the target (English) subcorpus must
    score higher on average than the rest, and a driver-side exact
    recompute of a handful of documents must match to the integer."""
    import hashlib
    import math

    import numpy as np

    from fide_crawler_ray.pipelines.relational import _round_half_away
    from fide_crawler_ray.pipelines.textclean import (
        DSIR_BUCKETS, T, q_dsir_weights)

    out = q_dsir_weights(SF).to_pandas().set_index("doc_id")
    docs = T(SF, "documents", ["doc_id", "text", "lang"]).to_pandas()
    langs = docs.set_index("doc_id")["lang"]
    en = out.loc[langs[langs == "en"].index, "score_fp"]
    rest = out.loc[langs[langs != "en"].index, "score_fp"]
    assert en.mean() > rest.mean(), (en.mean(), rest.mean())

    # exact recompute of 5 docs
    B = DSIR_BUCKETS
    bk = {}

    def bucket(tok):
        if tok not in bk:
            bk[tok] = int(hashlib.md5(tok.encode()).hexdigest()[:8],
                          16) % B
        return bk[tok]

    t_cnt = np.zeros(B, np.int64)
    r_cnt = np.zeros(B, np.int64)
    for _, row in docs.iterrows():
        for tok in row["text"].split(" "):
            b = bucket(tok)
            r_cnt[b] += 1
            if row["lang"] == "en":
                t_cnt[b] += 1
    tt, rt = int(t_cnt.sum()), int(r_cnt.sum())
    w_raw = np.array([
        1e9 * (math.log((int(t) + 1.0) / (tt + float(B)))
               - math.log((int(r) + 1.0) / (rt + float(B))))
        for t, r in zip(t_cnt, r_cnt)])
    w_fp = _round_half_away(w_raw).astype(np.int64)
    for _, row in docs.head(5).iterrows():
        toks = row["text"].split(" ")
        exp = int(sum(int(w_fp[bucket(t)]) for t in toks))
        assert out.loc[row["doc_id"], "score_fp"] == exp
        assert out.loc[row["doc_id"], "n_tokens"] == len(toks)


def test_epoch_shuffle_is_deterministic_permutation():
    """Positions form a contiguous 1..n_s permutation per shard, the
    assignment matches a driver recompute, and two invocations agree
    (the reproducibility property random_shuffle lacks)."""
    import hashlib

    from fide_crawler_ray.pipelines.textclean import (
        EPOCH_SHUFFLE_SHARDS, T, q_epoch_shuffle)

    out = q_epoch_shuffle(SF).to_pandas()
    docs = T(SF, "documents", ["doc_id"]).to_pandas()
    assert len(out) == len(docs)
    assert set(out["doc_id"]) == set(docs["doc_id"])
    for shard, g in out.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    # driver recompute
    hs = {int(i): hashlib.md5(f"0:{i}".encode()).hexdigest()
          for i in docs["doc_id"]}
    exp_shard = {i: int(h[:8], 16) % EPOCH_SHUFFLE_SHARDS
                 for i, h in hs.items()}
    got_shard = dict(zip(out["doc_id"], out["shard"]))
    assert got_shard == exp_shard
    one = out[out["shard"] == out["shard"].iloc[0]].sort_values("pos")
    exp_order = sorted(one["doc_id"], key=lambda i: (hs[i], i))
    assert one["doc_id"].tolist() == exp_order
    again = q_epoch_shuffle(SF).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["shard", "pos"]).reset_index(drop=True),
        again.sort_values(["shard", "pos"]).reset_index(drop=True))


def test_bpe_train_tiers_identical_and_sane():
    """The distributed BPE tier (forced via max_driver_vocab=0) must be
    merge-for-merge identical to the plain-python driver tier, merges
    must be usable (re-applying them shortens the corpus tokenization),
    and the first merge must be the true most-frequent pair."""
    from collections import Counter

    from fide_crawler_ray.pipelines.textclean import (
        T, _bpe_apply, q_bpe_train)

    local = q_bpe_train(SF)
    dist = q_bpe_train(SF, max_driver_vocab=0)
    pd.testing.assert_frame_equal(local, dist)
    assert len(local) == 20

    docs = T(SF, "documents", ["text"]).to_pandas()
    wc = Counter()
    for t in docs["text"]:
        wc.update(t.split(" "))
    pair_counts = Counter()
    for w, c in wc.items():
        syms = list(w) + ["</w>"]
        for p in zip(syms, syms[1:]):
            pair_counts[p] += c
    best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    assert (local["left"].iloc[0], local["right"].iloc[0]) == best[0]
    assert local["pair_count"].iloc[0] == best[1]

    # applying all merges must shorten tokenization vs chars
    n_before = sum((len(w) + 1) * c for w, c in wc.items())
    vocab = {w: list(w) + ["</w>"] for w in wc}
    for _, m in local.iterrows():
        vocab = {w: _bpe_apply(s, m["left"], m["right"])
                 for w, s in vocab.items()}
    n_after = sum(len(vocab[w]) * c for w, c in wc.items())
    assert n_after < n_before


def test_bpe_encode_matches_scalar_spec():
    """The actor-pool encode equals a pure-python re-encode with the
    same merge table, and token counts respect the BPE bounds
    (n_words <= n_tokens <= n_chars + n_words)."""
    import numpy as np
    import pandas as pd

    from fide_crawler_ray.pipelines.textclean import (
        _bpe_apply, q_bpe_encode, q_bpe_train)
    from fide_crawler_ray.pipelines.queries import T

    got = q_bpe_encode(SF).to_pandas().set_index("doc_id").sort_index()
    docs = (T(SF, "documents", ["doc_id", "text"]).to_pandas()
            .set_index("doc_id").sort_index())
    assert len(got) == len(docs)
    merges = list(zip(*(q_bpe_train(SF)[c] for c in ["left", "right"])))

    def ntok(w):
        syms = list(w) + ["</w>"]
        for a, b in merges:
            syms = _bpe_apply(syms, a, b)
        return len(syms)

    sample = docs.sample(n=min(len(docs), 30), random_state=3)
    for doc_id, row in sample.iterrows():
        ws = (row["text"] or "").split(" ")
        assert got.loc[doc_id, "n_words"] == len(ws)
        assert got.loc[doc_id, "n_tokens"] == sum(ntok(w) for w in ws)
    nchars = docs["text"].fillna("").str.replace(" ", "").str.len()
    assert (got["n_tokens"] >= got["n_words"]).all()
    assert (got["n_tokens"].to_numpy()
            <= nchars.to_numpy() + got["n_words"].to_numpy()).all()
