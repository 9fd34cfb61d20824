"""Unit tests: perf rating (vs a direct transliteration of the reference
lookup), fuzzy ratio, text stats, sketches."""

import numpy as np
import pyarrow as pa

from fide_crawler_ray.functions import sketches as SK
from fide_crawler_ray.functions import textstats as TS
from fide_crawler_ray.functions.fuzzy import best_match, clean_link, lev_ratio
from fide_crawler_ray.functions.perf_rating import rating_performance


def _ref_perf(n, points, avg, rating_sum, wins, losses):
    """Scalar reference semantics (performanceCalculator.py:9-178)."""
    half = {
        8: [-800, -444, -322, -251, -193, -141, -95, -43, 0],
        9: [-800, -444, -351, -273, -220, -166, -125, -80, -43, 0],
        10: [-800, -470, -366, -296, -240, -193, -149, -110, -72, -36, 0],
        11: [-800, -470, -383, -309, -262, -211, -175, -133, -102, -65, -36, 0],
    }
    if n in half:
        p2 = round(points * 2)
        tab = half[n]
        if 0 <= p2 <= 2 * n:
            d = tab[p2] if p2 < len(tab) else -tab[2 * n - p2]
            return avg + d
        return None
    return round((rating_sum + 400 * (wins - losses)) / n) if n > 0 else 0


def test_perf_rating_lookup_all_cells():
    ns, ps, avgs = [], [], []
    for n in (8, 9, 10, 11):
        for p2 in range(0, 2 * n + 1):
            ns.append(n)
            ps.append(p2 / 2)
            avgs.append(2400)
    out = rating_performance(np.array(ns), np.array(ps), np.array(avgs),
                             np.zeros(len(ns)), np.zeros(len(ns)), np.zeros(len(ns)))
    for i, (n, p) in enumerate(zip(ns, ps)):
        assert out[i] == _ref_perf(n, p, 2400, 0, 0, 0), (n, p)


def test_perf_rating_closed_form_and_edges():
    out = rating_performance(
        np.array([12, 5, 0, 8]),
        np.array([9.0, 3.0, 0.0, 2.25]),   # 2.25 → not tabulated → NaN
        np.array([2400.0, 2300.0, 0.0, 2400.0]),
        np.array([28000.0, 11500.0, 0.0, 0.0]),
        np.array([7, 2, 0, 0]),
        np.array([1, 1, 0, 0]),
    )
    assert out[0] == _ref_perf(12, 9.0, 2400, 28000, 7, 1)
    assert out[1] == _ref_perf(5, 3.0, 2300, 11500, 2, 1)
    assert out[2] == 0.0
    assert np.isnan(out[3])  # reference falls through without a return


def test_lev_ratio_and_clean_link():
    assert lev_ratio("abc", "abc") == 1.0
    assert lev_ratio("", "") == 1.0
    assert lev_ratio("abc", "") == 0.0
    assert 0 < lev_ratio("tata steel 2023", "tata steel masters 2023") < 1
    assert clean_link("https://view.livechesscloud.com/#tata-steel-2023") == "tata steel 2023"
    best, r = best_match("tata steel 2023",
                         ["https://chess.com/events/other-event",
                          "https://view.livechesscloud.com/#tata-steel-2023"])
    assert "tata-steel" in best and r > 0.9


def _doc_batch(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats_and_quality():
    b = _doc_batch(["the quick brown fox", "", "a b!! 123"])
    out = TS.token_stats_batch(b)
    assert out["n_ws_tokens"].to_pylist() == [4, 0, 3]
    assert out["n_word_tokens"].to_pylist() == [4, 0, 3]
    q = TS.quality_batch(b)
    assert q["n_chars"].to_pylist() == [19, 0, 9]
    assert q["stopword_ratio"].to_pylist()[0] == 0.25  # 'the' of 4 words
    assert q["digit_ratio"].to_pylist()[2] > 0


def test_langid_heuristic_on_real_phrases():
    texts = [
        "the cat and the dog run to the house in the morning",
        "der hund und die katze sind nicht mit dem mann",
        "le chat et la maison dans les montagnes pour une nuit",
        "el perro y el gato en la casa por una noche",
        "",
    ]
    out = TS.LangId()(_doc_batch(texts))
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "es", "und"]


def test_fingerprint_normalization():
    b = _doc_batch(["Hello   World", "hello world", "hello  world!"])
    out = TS.fingerprint_batch(b)
    fps = out["md5_fp"].to_pylist()
    assert fps[0] == fps[1] != fps[2]
    rolls = out["roll_fp"].to_pylist()
    assert rolls[0] == rolls[1]


def test_minhash_jaccard_correlation():
    mh = SK.MinHasher(n_perm=256)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated content here now"
    sa, sb, sc = (mh.signature(SK._hash64(SK.shingles(t, 3))) for t in (a, b, c))
    est_ab = (sa == sb).mean()
    est_ac = (sa == sc).mean()
    true_ab = SK.jaccard(a, b, 3)
    assert abs(est_ab - true_ab) < 0.15
    assert est_ac < 0.1 < est_ab


def test_minhash_band_keys_identical_for_identical_docs():
    mh = SK.MinHasher()
    s = mh.signature(SK._hash64(SK.shingles("same text here okay", 3)))
    assert SK.band_keys(s, 16) == SK.band_keys(s.copy(), 16)
    assert len(SK.band_keys(s, 16)) == 16


def test_simhash_hamming_near_vs_far():
    a = SK.simhash64("the quick brown fox jumps over the lazy dog " * 5)
    b = SK.simhash64("the quick brown fox jumps over the lazy cat " * 5)
    c = SK.simhash64("totally unrelated document about databases and queries " * 5)
    assert SK.hamming64(a, b) < SK.hamming64(a, c)
    assert SK.hamming64(a, a) == 0


def test_ngram_jaccard():
    assert SK.ngram_jaccard("abcdef", "abcdef", 3) == 1.0
    assert SK.ngram_jaccard("abcdef", "uvwxyz", 3) == 0.0


def test_union_find_deterministic_roots():
    uf = SK.UnionFind()
    uf.union(5, 3)
    uf.union(3, 9)
    uf.union(1, 2)
    g = uf.groups()
    assert g[5] == g[3] == g[9] == 3
    assert g[1] == g[2] == 1


def test_localization_rename():
    import pandas as pd
    import ray.data as rd

    from fide_crawler_ray.functions.localization import (
        localize_columns,
        localize_dataset,
    )

    df = pd.DataFrame({"tournament_name": ["T"], "result": [1.0], "other": [2]})
    en = localize_columns(df, "en-US")
    assert list(en.columns) == ["Tournament Name", "Result", "other"]
    pt = localize_columns(df, "pt-BR")
    assert list(pt.columns) == ["Nome do Torneio", "Resultado", "other"]
    assert list(localize_columns(df, "xx").columns) == list(df.columns)
    ds = localize_dataset(rd.from_pandas(df), "pt-BR")
    assert "Nome do Torneio" in ds.schema().names


def test_edit_distance_properties():
    """Unit-cost Levenshtein: identity, symmetry, known values, and the
    triangle inequality on a few fixed strings."""
    from fide_crawler_ray.functions.fuzzy import edit_distance as ed

    assert ed("", "") == 0
    assert ed("abc", "") == 3 and ed("", "abc") == 3
    assert ed("kitten", "sitting") == 3
    assert ed("flaw", "lawn") == 2
    words = ["table", "tale", "tables", "cable", "tbale"]
    for a in words:
        for b in words:
            assert ed(a, b) == ed(b, a)
            for c in words:
                assert ed(a, c) <= ed(a, b) + ed(b, c)
