"""Parser parity: the engine's kind-driven span parsers must reproduce the
reference-semantics positional parsers on every synthetic page, and the
fetch stage must preserve span sequences exactly (kind, text, media_ref,
order) — the per-row invariant from BASELINE.json input_hint."""

import pyarrow as pa

from fide_crawler_ray import refsem, synth
from fide_crawler_ray.stages import parse as P
from fide_crawler_ray.stages import urls as U

CFG = synth.SiteConfig(seed=42, n_players=6, n_queries=2, n_months=8)


def _doc_batch(docs, fide_ids, names, prios):
    spans_type = pa.list_(
        pa.struct([("kind", pa.string()), ("text", pa.string()),
                   ("media_ref", pa.string()), ("offset", pa.int32())])
    )
    return pa.table({
        "doc_id": pa.array([d["doc_id"] for d in docs]),
        "doc_kind": pa.array([d["kind"] for d in docs]),
        "spans": pa.array([d["spans"] for d in docs], spans_type),
        "fide_id": pa.array(fide_ids),
        "player_name": pa.array(names),
        "priority": pa.array(prios, pa.int64()),
    })


def test_render_deterministic():
    u = synth.calc_url("100001", "2022-03-01")
    assert synth.render_url(CFG, u) == synth.render_url(CFG, u)
    assert len(synth.months_of(CFG)) == CFG.n_months


def test_span_offsets_strictly_increasing():
    for pid in synth.player_ids(CFG):
        for m in synth.months_of(CFG):
            doc = synth.render_calc(CFG, pid, m)
            offs = [s["offset"] for s in doc["spans"]]
            assert offs == sorted(offs) == list(range(len(offs)))


def test_calc_parser_matches_reference_positional():
    """Engine kind-driven parse == reference positional parse (M9)."""
    rows_ref, docs, fids, names, prios = [], [], [], [], []
    for i, pid in enumerate(synth.player_ids(CFG)):
        pname = synth.player_name(CFG, pid)
        for j, m in enumerate(synth.months_of(CFG)):
            doc = synth.render_calc(CFG, pid, m)
            docs.append(doc)
            fids.append(pid)
            names.append(pname)
            prios.append(U.pack_priority(0, i + 1, U.KIND_CALC, U.month_index(m)))
            rows_ref.extend(refsem.parse_calc_positional(doc["spans"], pid, pname))
    out = P.parse_calc_batch(_doc_batch(docs, fids, names, prios))
    got = out.drop_columns(["lineage"]).to_pylist()
    assert len(got) == len(rows_ref) > 100
    for g, r in zip(got, rows_ref):
        assert g == r


def test_calc_parser_skips_malformed_doc_without_leaking_rows():
    """A calc doc with fewer media spans than game rows (IndexError on
    the color zip) is skipped WHOLE — no partial rows leak, the task
    survives, and well-formed docs in the same batch still parse
    (reference parity: bare except per page, data_fetching_processing
    .py:195)."""
    pid = synth.player_ids(CFG)[0]
    m = synth.months_of(CFG)[0]
    good = synth.render_calc(CFG, pid, m)
    n_games = sum(1 for s in good["spans"] if s["kind"] == "game")
    assert n_games > 0
    bad = dict(good)
    bad["spans"] = [s for s in good["spans"] if s["kind"] != "media"][:-1] + \
        [s for s in good["spans"] if s["kind"] == "media"][:1]
    # bad doc: ≥2 game rows but only 1 media span → IndexError mid-doc
    batch = _doc_batch([bad, good], [pid, pid], ["x", "x"], [0, 1 << 20])
    out = P.parse_calc_batch(batch)
    good_only = P.parse_calc_batch(_doc_batch([good], [pid], ["x"], [1 << 20]))
    assert out.num_rows == good_only.num_rows  # bad doc contributed 0 rows
    assert out.drop_columns(["lineage"]).to_pylist() == \
        good_only.drop_columns(["lineage"]).to_pylist()


def test_calc_parser_drops_footnote_and_handles_empty():
    # find a month with no calc table
    found_empty = False
    for pid in synth.player_ids(CFG):
        for m in synth.months_of(CFG):
            doc = synth.render_calc(CFG, pid, m)
            if not doc["spans"]:
                found_empty = True
                out = P.parse_calc_batch(_doc_batch([doc], [pid], ["x"], [0]))
                assert out.num_rows == 0
    assert found_empty, "synth should produce some empty months"


def test_search_parser_matches_reference():
    for q in synth.seed_queries(CFG):
        doc = synth.render_search(CFG, q)
        ref = refsem.parse_search(doc["spans"])
        batch = _doc_batch([doc], [""], [""], [U.pack_priority(3, 0, U.KIND_SEARCH, 0)])
        got = P.parse_search_batch(batch).to_pylist()
        assert [g["name"] for g in got] == [r["name"] for r in ref]
        assert [g["id"] for g in got] == [r["id"] for r in ref]
        assert all(g["seed_rank"] == 3 for g in got)
        # decoys were present and rejected
        assert len(doc["spans"]) > len(got)


def test_profile_parser_matches_reference():
    for pid in synth.player_ids(CFG):
        doc = synth.render_profile(CFG, pid)
        ref = refsem.parse_profile(doc["spans"], pid)
        got = P.parse_profile_batch(_doc_batch([doc], [pid], [""], [0])).to_pylist()
        assert len(got) == 1
        assert got[0] == ref


def test_fetcher_preserves_span_sequences():
    """Per-row span-sequence equality between fetched docs and direct
    renders: kind, text, media_ref, order."""
    urls, kinds = [], []
    for pid in synth.player_ids(CFG)[:3]:
        urls.append(synth.profile_url(pid))
        urls.append(synth.calc_url(pid, synth.months_of(CFG)[0]))
    rows = U.make_url_rows(urls, ["x"] * len(urls), [""] * len(urls),
                           [""] * len(urls), [""] * len(urls), [0] * len(urls))
    out = P.Fetcher(CFG)(rows)
    for i in range(out.num_rows):
        url = out["doc_id"][i].as_py()
        expect = synth.render_url(CFG, url)["spans"]
        got = out["spans"][i].as_py()
        assert got == expect


def test_url_canonicalize_and_predicate():
    assert U.canonicalize("HTTPS://Fide.com:443/search?query=x#frag") == \
        "https://fide.com/search?query=x"
    assert U.canonicalize("https://a.com/b/") == "https://a.com/b"
    arr = pa.array([
        "/profile/123", "https://fide.com/news/1", "/profile/news/9", "/calendar/2",
    ])
    assert list(U.url_keep_mask(arr)) == [True, False, False, False]
    ids = U.extract_profile_ids(pa.array(["/profile/123", "/x/9"]))
    assert ids.to_pylist() == ["123", "Sem ID"]


def test_calc_vectorized_matches_scalar():
    """parse_calc_batch (vectorized hot path) must be byte-identical to
    parse_calc_batch_scalar (the executable spec) on a heavy corpus AND
    on crafted malformed documents exercising every rollback path."""
    import pandas as pd

    cfg = synth.SiteConfig(seed=11, n_players=40, n_queries=8, n_months=6,
                           games_lo=20, games_hi=40,
                           max_tournaments_per_month=4)
    months = synth.months_of(cfg)
    urls = [synth.calc_url(pid, m)
            for pid in range(100000, 100030) for m in months]
    n = len(urls)
    batch = pa.table({
        "url": pa.array(urls, pa.string()),
        "priority": pa.array(range(n), pa.int64()),
        "fide_id": pa.array([str(100000 + i % 30) for i in range(n)],
                            pa.string()),
        "player_name": pa.array([f"pn{i % 9}" for i in range(n)],
                                pa.string()),
    })
    doc = P.make_fetch_fn(cfg)(batch)
    pd.testing.assert_frame_equal(P.parse_calc_batch_scalar(doc).to_pandas(),
                                  P.parse_calc_batch(doc).to_pandas())

    spans_type = pa.list_(pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]))

    def S(k, t, m, o):
        return {"kind": k, "text": t, "media_ref": m, "offset": o}

    docs = [
        [S("header", "T1|2022-01-01", "", 0), S("rating", "2300", "", 1),
         S("media", "clr_wh", "clr_wh", 2),
         S("game", "opp|2100|BRA|1.0|3|40|2.2", "", 3)],
        [S("header", "NOPIPE", "", 0), S("media", "clr_bl", "clr_bl", 1),
         S("game", "o|2|c|r|ch|k|kc", "", 2)],            # bad header
        [S("header", "T2|2022-02-02", "", 0),
         S("media", "clr_wh", "clr_wh", 1),
         S("game", "only|three|fields", "", 2)],          # short game row
        [S("header", "T3|2022-03-03", "", 0),
         S("media", "clr_wh", "clr_wh", 1),
         S("game", "o|2|c|r|ch|k|kc", "", 2),
         S("game", "o2|2|c|r|ch|k|kc", "", 3)],           # games > media
        [S("game", "o|2|c|r|ch|k|kc", "", 0),
         S("media", "clr_bl", "clr_bl", 1)],              # no header/rating
        [S("header", "T4|2022-04-04", "", 0),
         S("media", "clr_wh", "clr_wh", 1),
         S("media", "clr_bl", "clr_bl", 2),
         S("game", "|2100|BRA|1.0|3|40|2.2", "", 3),      # empty field row
         S("game", "ok|2100|BRA|1.0|3|40|2.2", "", 4)],
        [],                                               # empty doc
    ]
    mb = pa.table({
        "doc_id": pa.array([f"d{i}" for i in range(len(docs))], pa.string()),
        "doc_kind": pa.array(["calc"] * len(docs), pa.string()),
        "spans": pa.array(docs, spans_type),
        "fide_id": pa.array([f"f{i}" for i in range(len(docs))], pa.string()),
        "player_name": pa.array([f"p{i}" for i in range(len(docs))],
                                pa.string()),
        "priority": pa.array(list(range(len(docs))), pa.int64()),
    })
    a = P.parse_calc_batch_scalar(mb).to_pandas()
    b = P.parse_calc_batch(mb).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # the malformed docs (1, 2, 3) contributed no rows; row-dropped doc
    # 5 kept exactly its valid row
    assert sorted(a["fide_id"]) == ["f0", "f4", "f5"]
