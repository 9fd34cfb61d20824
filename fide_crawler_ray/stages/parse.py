"""Fetch + kind-driven span parsers as Ray Data ``map_batches`` stages.

All stages are Arrow-in / Arrow-out (``batch_format="pyarrow"``). Parsing
a document is inherently sequential *within* the document (span order is
load-bearing — reference zips img color spans with game rows by a
document-global index: data_processing/data_fetching_processing.py:156-194),
so the per-document work is a tight Python loop over that document's
spans, vectorized *across* documents by batching; column construction is
columnar (build lists once, one ``pa.Table`` per batch out).

The kind-driven calc parser here is cross-validated against the
positional reference-semantics parser (refsem.parse_calc_positional) in
tests — per-row span-sequence equality is the correctness invariant
(BASELINE.json input_hint).
"""

from __future__ import annotations

import pyarrow as pa

from .. import synth
from ..schema import FOOTNOTE_TEXT
from . import urls as U

_GAME_COLS = [
    "fide_id", "date", "tournament_name", "country", "player_name",
    "player_rating", "player_color", "opponent_name", "opponent_rating",
    "result", "chg", "k", "k_chg",
]


class Fetcher:
    """Fetch stage: URL rows → span documents (+passthrough url metadata).

    Stands in for the reference's HTTP GETs (reference
    data_fetching_processing.py:88-89, :147); pages render deterministically
    from (SiteConfig, url). A callable class so a real deployment can hold
    connection pools / robots caches in ``__init__`` (actor pool state);
    here init just pins the site config once per actor.
    """

    def __init__(self, cfg: synth.SiteConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return fetch_batch(self.cfg, batch)


def make_fetch_fn(cfg: synth.SiteConfig):
    """Task-pool variant of the fetch stage: for the synthetic site the
    per-actor state is just the (tiny) config, so plain tasks avoid the
    per-epoch actor-pool spin-up cost. A real HTTP deployment would use
    the ``Fetcher`` class (connection pools live in ``__init__``)."""

    def _fetch(batch: pa.Table) -> pa.Table:
        return fetch_batch(cfg, batch)

    return _fetch


# inline retry budget per URL; the reference retries transient failures
# in the fetch slot itself (old_scripts/fide-games-scraper-public.py:48),
# which keeps crawl ordering exact — a requeue would reorder
FETCH_MAX_ATTEMPTS = 5


def _fetch_one(cfg: synth.SiteConfig, url: str) -> dict:
    for attempt in range(FETCH_MAX_ATTEMPTS):
        try:
            return synth.fetch_url(cfg, url, attempt)
        except synth.TransientFetchError:
            # a real deployment would back off here; pacing is owned by
            # the frontier's virtual-time politeness, not the fetcher
            continue
    raise RuntimeError(
        f"fetch failed after {FETCH_MAX_ATTEMPTS} attempts: {url}")


def fetch_batch(cfg: synth.SiteConfig, batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    docs = [_fetch_one(cfg, u) for u in urls]
    spans_type = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("offset", pa.int32())]
        )
    )
    return pa.table(
        {
            "doc_id": pa.array([d["doc_id"] for d in docs], pa.string()),
            "doc_kind": pa.array([d["kind"] for d in docs], pa.string()),
            "spans": pa.array([d["spans"] for d in docs], spans_type),
            "fide_id": batch["fide_id"],
            "player_name": batch["player_name"],
            "priority": batch["priority"],
        }
    )


def parse_search_batch(batch: pa.Table) -> pa.Table:
    """M1+M2+M3: search docs → accepted player result rows.

    Emits one row per accepted search result with the per-page result
    index (1-based) for priority packing. Predicate and id-regex are the
    vectorized kernels in stages.urls (reference :64-68).
    """
    import pyarrow.compute as pc

    batch = batch.filter(pc.equal(batch["doc_kind"], "search"))
    names, titles, hrefs, ids, ranks, ridxs = [], [], [], [], [], []
    spans_col = batch["spans"].to_pylist()
    prios = batch["priority"].to_pylist()
    for spans, prio in zip(spans_col, prios):
        seed_rank = prio >> 34
        ridx = 0
        for s in spans:
            if s["kind"] != "field":
                continue
            name, title, href = s["text"].split("|", 2)
            ridx += 1
            names.append(name)
            titles.append(title)
            hrefs.append(href)
            ranks.append(seed_rank)
            ridxs.append(ridx)
    t = pa.table(
        {
            "name": pa.array(names, pa.string()),
            "title": pa.array(titles, pa.string()),
            "url": pa.array(hrefs, pa.string()),
            "seed_rank": pa.array(ranks, pa.int32()),
            "result_idx": pa.array(ridxs, pa.int32()),
        }
    )
    if t.num_rows == 0:
        return t.append_column("id", pa.array([], pa.string()))
    keep = U.url_keep_mask(t["url"].combine_chunks())
    t = t.filter(pa.array(keep))
    ids_arr = U.extract_profile_ids(t["url"].combine_chunks())
    return t.append_column("id", ids_arr)


def expand_frontier_batch(
    results: pa.Table,
    months: list[str],
    watermarks: dict[str, tuple[str, str]] | None = None,
) -> pa.Table:
    """M7+M8: accepted search results → profile + calc URL rows.

    Month-range expansion mirrors the reference's month walk
    (data_fetching_processing.py:123-138); ``watermarks`` implements the
    incremental-crawl gap fetch (ST3/J4, reference :216-234): months
    inside [wm_min, wm_max] for a player are already stored and are not
    re-enqueued.
    """
    urls, kinds, fids, periods, pnames, prios = [], [], [], [], [], []
    wm = watermarks or {}
    for i in range(results.num_rows):
        pid = results["id"][i].as_py()
        name = results["name"][i].as_py()
        seed_rank = int(results["seed_rank"][i].as_py())
        ridx = int(results["result_idx"][i].as_py())
        urls.append(synth.profile_url(pid))
        kinds.append("profile")
        fids.append(pid)
        periods.append("")
        pnames.append(name)
        prios.append(U.pack_priority(seed_rank, ridx, U.KIND_PROFILE, 0))
        lo_hi = wm.get(pid)
        for m in months:
            if lo_hi is not None and lo_hi[0] <= m <= lo_hi[1]:
                continue
            urls.append(synth.calc_url(pid, m))
            kinds.append("calc")
            fids.append(pid)
            periods.append(m)
            pnames.append(name)
            prios.append(U.pack_priority(seed_rank, ridx, U.KIND_CALC, U.month_index(m)))
    return U.make_url_rows(urls, kinds, fids, periods, pnames, prios)


def parse_profile_batch(batch: pa.Table) -> pa.Table:
    """M5+M6: profile docs → PLAYER_DATA rows (dynamic rating keys map to
    fixed std/rapid/blitz columns; absent → '' per safe_extract default,
    reference :80-85, :110-114)."""
    cols: dict[str, list] = {k: [] for k in (
        "fide_id", "name", "world_rank", "federation", "b_year", "sex",
        "fide_title", "profile_photo", "std_rating", "rapid_rating",
        "blitz_rating")}
    import pyarrow.compute as pc

    batch = batch.filter(pc.equal(batch["doc_kind"], "profile"))
    spans_col = batch["spans"].to_pylist()
    fids = batch["fide_id"].to_pylist()
    for spans, fid in zip(spans_col, fids):
        rec = {k: "" for k in cols}
        rec["fide_id"] = fid
        for s in spans:
            if s["kind"] == "media":
                rec["profile_photo"] = s["media_ref"]
            elif s["kind"] == "field":
                label, value = s["text"].split("|", 1)
                if label in ("name", "world_rank", "federation", "b_year", "sex", "fide_title"):
                    rec[label] = value
                elif label in ("std", "rapid", "blitz"):
                    rec[f"{label}_rating"] = "".join(c for c in value if c.isdigit())
        for k in cols:
            cols[k].append(rec[k])
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def parse_calc_batch(batch: pa.Table) -> pa.Table:
    """M9 (flagship): calc span docs → raw game rows + lineage —
    VECTORIZED over the flattened span arrays (the crawl's hot path:
    ~2.3 ms/page in the scalar state machine → ~0.4 ms/page here).

    Same semantics as :func:`parse_calc_batch_scalar` (the original
    per-span state machine, kept as the executable spec and pinned
    byte-identical by ``test_calc_vectorized_matches_scalar``):

    - header / rating state forward-fills to later game rows — computed
      with a running-max over span positions, cross-document leaks
      masked by comparing parent doc ids;
    - game row i takes the i-th MEDIA span of its document (colorIndex
      semantics, reference data_fetching_processing.py:156-162) — a
      per-doc rank join on cumulative counts;
    - malformed documents (header without '|', game row with <7 fields,
      more game rows than media spans) are dropped WHOLE, reproducing
      the scalar path's per-document try/except rollback (reference's
      bare except at :195);
    - rows with an empty required field are dropped individually (:192).
    """
    import numpy as np
    import pyarrow.compute as pc

    batch = batch.filter(pc.equal(batch["doc_kind"], "calc"))
    ndocs = batch.num_rows
    empty = pa.table({
        **{c: pa.array([], pa.string()) for c in _GAME_COLS},
        "lineage": pa.array([], pa.int64()),
    })
    if ndocs == 0:
        return empty
    spans = batch["spans"].combine_chunks()
    lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64), nan=0.0).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])
    vals = spans.flatten()
    n = len(vals)
    if n == 0:
        return empty
    parent = np.repeat(np.arange(ndocs, dtype=np.int64), lens)
    kind = pc.struct_field(vals, "kind")
    text = pc.struct_field(vals, "text")
    mref = pc.struct_field(vals, "media_ref")
    off = pc.struct_field(vals, "offset").to_numpy(
        zero_copy_only=False).astype(np.int64)

    is_header = pc.equal(kind, "header").to_numpy(zero_copy_only=False)
    is_rating = pc.equal(kind, "rating").to_numpy(zero_copy_only=False)
    is_game = pc.equal(kind, "game").to_numpy(zero_copy_only=False)
    is_media = pc.equal(kind, "media").to_numpy(zero_copy_only=False)
    pos = np.arange(n, dtype=np.int64)

    # forward-fill: global running-max of (span pos + 1) at state spans;
    # a fill whose source doc differs from the reader's doc is masked
    hrun = np.maximum.accumulate(np.where(is_header, pos + 1, 0))
    rrun = np.maximum.accumulate(np.where(is_rating, pos + 1, 0))
    hvalid = (hrun > 0) & (parent[np.maximum(hrun - 1, 0)] == parent)
    rvalid = (rrun > 0) & (parent[np.maximum(rrun - 1, 0)] == parent)

    # per-doc ranks via exclusive cumulative counts
    gcum0 = np.concatenate([[0], np.cumsum(is_game)])
    mcum0 = np.concatenate([[0], np.cumsum(is_media)])
    grank = gcum0[pos] - gcum0[offsets[parent]]        # games before span, in doc
    m_before = mcum0[offsets[parent]]                  # media before doc start
    m_count = mcum0[offsets[1:]] - mcum0[offsets[:-1]]  # media per doc

    # header/rating values as plain lists (headers are a handful per
    # page; bad headers keep their slot so ordinals stay aligned)
    tname_h: list = []
    tdate_h: list = []
    hbad: list = []
    if is_header.any():
        for s in text.filter(pa.array(is_header)).to_pylist():
            p = s.split("|", 1)
            tname_h.append(p[0])
            tdate_h.append(p[1] if len(p) > 1 else None)
            hbad.append(len(p) == 1)

    # ---- malformed-document flags (scalar try/except rollback parity)
    bad_doc = np.zeros(ndocs, dtype=bool)
    # header without '|' → ValueError at that span
    if hbad:
        np.logical_or.at(bad_doc, parent[is_header],
                         np.array(hbad, dtype=bool))
    # game row beyond the doc's media spans → IndexError on the color zip
    np.logical_or.at(bad_doc, parent[is_game],
                     (grank >= m_count[parent])[is_game])
    # game row with <7 '|'-fields → IndexError on f[6]
    gtext = text.filter(pa.array(is_game))
    gsplit = None
    if len(gtext):
        gsplit = pc.split_pattern(gtext, "|")
        gshort = pc.less(pc.list_value_length(gsplit), 7).to_numpy(
            zero_copy_only=False)
        np.logical_or.at(bad_doc, parent[is_game], gshort)

    keep_game = is_game & ~bad_doc[parent]
    if not keep_game.any():
        return empty
    # index arrays over the GAME-SPAN subsequence (aligned with gtext)
    game_keep = keep_game[is_game]

    # split fields of surviving games (all have ≥7 fields by now)
    gs = gsplit.filter(pa.array(game_keep))
    fields = [pc.list_element(gs, i) for i in range(7)]
    row_ok = np.ones(len(gs), dtype=bool)
    for f in fields:
        row_ok &= pc.not_equal(f, "").to_numpy(zero_copy_only=False)

    kg = pos[keep_game]                 # global positions of kept game spans
    # color: the grank-th media span of the doc, white iff ref has clr_wh
    white_all = pc.fill_null(
        pc.match_substring(mref, "clr_wh"), False).to_numpy(
        zero_copy_only=False)
    midx = pos[is_media]
    color_white = white_all[midx[(m_before + grank)[kg]]]

    # header/rating forward-fill values for kept games
    hord = np.cumsum(is_header) - 1     # header ordinal at header spans
    rord = np.cumsum(is_rating) - 1
    rtext_all = (text.filter(pa.array(is_rating)).to_pylist()
                 if is_rating.any() else [])

    def _ffill_strings(run, valid, ord_at, values: list):
        """values[ordinal of source span] where valid, else null."""
        out = np.full(len(kg), None, dtype=object)
        v = valid[kg]
        if values and v.any():
            src = ord_at[run[kg][v] - 1]
            out[v] = [values[i] for i in src]
        return out

    tname = _ffill_strings(hrun, hvalid, hord, tname_h)
    tdate = _ffill_strings(hrun, hvalid, hord, tdate_h)
    rating = _ffill_strings(rrun, rvalid, rord, rtext_all)

    # assemble (row_ok filter last, mirroring scalar per-row dropna)
    sel = pa.array(row_ok)
    fid = batch["fide_id"].combine_chunks().take(pa.array(parent[kg]))
    pname = batch["player_name"].combine_chunks().take(pa.array(parent[kg]))
    prio = batch["priority"].to_numpy(zero_copy_only=False)[parent[kg]]
    t = pa.table({
        "fide_id": fid,
        "date": pa.array(tdate, pa.string()),
        "tournament_name": pa.array(tname, pa.string()),
        "country": fields[2],
        "player_name": pname,
        "player_rating": pa.array(rating, pa.string()),
        "player_color": pa.array(
            np.where(color_white, "white", "black"), pa.string()),
        "opponent_name": fields[0],
        "opponent_rating": fields[1],
        "result": fields[3],
        "chg": fields[4],
        "k": fields[5],
        "k_chg": fields[6],
        "lineage": pa.array((prio << 16) | off[kg], pa.int64()),
    })
    return t.filter(sel)


def parse_calc_batch_scalar(batch: pa.Table) -> pa.Table:
    """M9 reference implementation (executable spec for the vectorized
    parse_calc_batch; kept for the byte-parity test): calc span docs →
    raw game rows + lineage.

    Kind-driven equivalent of the reference's positional parse
    (data_fetching_processing.py:149-194): footnote spans dropped (:152),
    per-block header/rating state, game rows zipped with the i-th media
    span *in document order* (colorIndex semantics :156-162, :194), rows
    with a missing required field dropped (per-append dropna :192).

    ``lineage`` = (url priority << 16 | span offset) — a monotone id that
    reproduces SQLite insertion order for the dedup keep-first tiebreak
    (reference database/database_management.py:56-71).
    """
    out: dict[str, list] = {c: [] for c in _GAME_COLS}
    out["lineage"] = []
    import pyarrow.compute as pc

    batch = batch.filter(pc.equal(batch["doc_kind"], "calc"))
    spans_col = batch["spans"].to_pylist()
    fids = batch["fide_id"].to_pylist()
    pnames = batch["player_name"].to_pylist()
    prios = batch["priority"].to_pylist()
    for spans, fid, pname, prio in zip(spans_col, fids, pnames, prios):
        if not spans:
            continue
        # Per-document isolation: a malformed document (e.g. fewer media
        # spans than game rows → IndexError on the color zip) is skipped
        # whole, mirroring the reference's per-page error swallow (bare
        # except at data_fetching_processing.py:195) instead of killing
        # the fetch/parse task. Rows append directly to the batch output
        # (this loop is the crawl's hot path) and roll back to the
        # document's start mark on error, so a partial document never
        # leaks rows.
        mark = len(out["lineage"])
        try:
            colors = ["white" if "clr_wh" in s["media_ref"] else "black"
                      for s in spans if s["kind"] == "media"]
            color_index = 0
            tname = tdate = rating = None
            for s in spans:
                k = s["kind"]
                if k == "header":
                    tname, tdate = s["text"].split("|", 1)
                elif k == "rating":
                    rating = s["text"]
                elif k == "game":
                    f = s["text"].split("|")
                    color = colors[color_index]
                    color_index += 1
                    if not all([f[0], f[1], f[2], f[3], f[4], f[5], f[6]]):
                        continue  # dropna: missing required field (:192)
                    out["fide_id"].append(fid)
                    out["date"].append(tdate)
                    out["tournament_name"].append(tname)
                    out["country"].append(f[2])
                    out["player_name"].append(pname)
                    out["player_rating"].append(rating)
                    out["player_color"].append(color)
                    out["opponent_name"].append(f[0])
                    out["opponent_rating"].append(f[1])
                    out["result"].append(f[3])
                    out["chg"].append(f[4])
                    out["k"].append(f[5])
                    out["k_chg"].append(f[6])
                    out["lineage"].append((prio << 16) | s["offset"])
        except (IndexError, ValueError, KeyError):
            for c in out:  # roll back the partial document
                del out[c][mark:]
            continue  # skip malformed document (reference parity)
    t = pa.table({c: pa.array(out[c], pa.string()) for c in _GAME_COLS})
    return t.append_column("lineage", pa.array(out["lineage"], pa.int64()))
