"""Reference-semantics crawler + parser (single-process test golden).

This module re-states the reference's *positional* algorithm
(reference: data_processing/data_fetching_processing.py:149-194) and its
sequential crawl loop as plain Python, operating on the synthetic span
documents. It is intentionally NOT Ray-based and NOT kind-driven: the
calc parser reconstructs the positional row table (like ``pd.read_html``
would), finds all-null limiter rows, reads header fields at limiter-3 /
rating at limiter-1, slices games to next_limiter-3, and zips img color
spans by a document-global index (colorIndex, reference :156-194).

The Ray engine's kind-driven span parser (stages/parse.py) must produce
identical rows; tests cross-validate the two on every generated page.
The sequential crawl order produced here is the golden for the engine's
crawl-ordering invariant (SURVEY.md O5), and the visited-URL set is the
golden for the frontier's URL-seen set.
"""

from __future__ import annotations

import re

from . import synth
from .schema import DEDUP_KEY, FOOTNOTE_TEXT

_WIDTH = 10  # positional table width (Unnamed: 0..9)


def _rows_from_spans(spans: list[dict]) -> tuple[list[list], list[str]]:
    """Reconstruct the positional text-row table and the ordered img color
    list from a span sequence (media spans are imgs, not table rows)."""
    rows: list[list] = []
    colors: list[str] = []
    for s in spans:
        kind = s["kind"]
        if kind == "media":
            colors.append("white" if "clr_wh" in s["media_ref"] else "black")
            continue
        row = [""] * _WIDTH
        if kind == "header":
            tname, tdate = s["text"].split("|", 1)
            row[0], row[7] = tname, tdate
        elif kind == "colheader":
            row[0] = "colheader"
        elif kind == "rating":
            row[1] = s["text"]
        elif kind == "limiter":
            row = [None] * _WIDTH
        elif kind == "game":
            f = s["text"].split("|")
            # Unnamed: 0=opponent, 3=opp_rating, 4=country, 5=result,
            # 7=chg, 8=k, 9=k_chg (reference :180-189); empty cell → None
            # (read_html renders empty cells as NaN)
            row[0] = f[0] or None
            row[3] = f[1] or None
            row[4] = f[2] or None
            row[5] = f[3] or None
            row[7] = f[4] or None
            row[8] = f[5] or None
            row[9] = f[6] or None
        elif kind == "footnote":
            row[0] = s["text"]
        rows.append(row)
    return rows, colors


def parse_calc_positional(spans: list[dict], fide_id: str, player_name: str) -> list[dict]:
    """Positional parse of one calc document → raw game dicts
    (reference :149-194 incl. per-append dropna at :192)."""
    if not spans:
        return []  # fullTable is None → page skipped (reference :150)
    rows, colors = _rows_from_spans(spans)
    # drop footnote rows, reset index (reference :152-153)
    rows = [r for r in rows if r[0] != FOOTNOTE_TEXT]
    limiters = [i for i, r in enumerate(rows) if all(c is None for c in r)]
    games: list[dict] = []
    color_index = 0
    for li, limiter in enumerate(limiters):
        tournament_name = rows[limiter - 3][0]
        tournament_date = rows[limiter - 3][7]
        player_rating = rows[limiter - 1][1]
        if li < len(limiters) - 1:
            local = rows[limiter + 1 : limiters[li + 1] - 3]
        else:
            local = rows[limiter + 1 :]
        for row in local:
            detail = {
                "fide_id": fide_id,
                "date": tournament_date,
                "tournament_name": tournament_name,
                "country": row[4],
                "player_name": player_name,
                "player_rating": player_rating,
                "player_color": colors[color_index],
                "opponent_name": row[0],
                "opponent_rating": row[3],
                "result": row[5],
                "chg": row[7],
                "k": row[8],
                "k_chg": row[9],
            }
            color_index += 1  # advances even for rows dropna will drop (:194)
            if all(v is not None for v in detail.values()):  # dropna (:192)
                games.append(detail)
    return games


_NON_DIGIT = re.compile(r"\D")


def normalize_games(games: list[dict]) -> list[dict]:
    """Reference process_game_history semantics (:247-259): numeric
    coercions, stable sort by date, drop_duplicates keep='first' on the
    5-col key, dropna."""
    out = []
    for i, g in enumerate(games):
        g = dict(g)
        opp = _NON_DIGIT.sub("", str(g["opponent_rating"]))
        g["opponent_rating"] = int(opp) if opp else None
        g["player_rating"] = int(g["player_rating"]) if str(g["player_rating"]).strip().isdigit() else None
        g["result"] = float(g["result"])
        g["chg"] = float(g["chg"])
        g["k"] = int(g["k"])
        g["k_chg"] = float(g["k_chg"])
        g["_ord"] = i  # insertion order (autoincrement id surrogate)
        out.append(g)
    # stable sort by date, then keep first per 5-col key
    out.sort(key=lambda g: (g["date"], g["_ord"]))
    seen = set()
    deduped = []
    for g in out:
        key = tuple(g[c] for c in DEDUP_KEY)
        if key in seen:
            continue
        seen.add(key)
        if any(v is None for v in g.values()):
            continue  # dropna (:257)
        del g["_ord"]
        deduped.append(g)
    return deduped


def parse_search(spans: list[dict]) -> list[dict]:
    """Search-result parse + URL predicate + id regex
    (reference :43-74; predicate at :68, regex at :64-65)."""
    players = []
    for s in spans:
        if s["kind"] != "field":
            continue
        name, title, href = s["text"].split("|", 2)
        m = re.search(r"/profile/(\d+)", href)
        pid = m.group(1) if m else "Sem ID"
        if "profile" in href and "news" not in href:
            players.append({"name": name, "title": title, "url": href, "id": pid})
    return players


def parse_profile(spans: list[dict], fide_id: str) -> dict:
    """Profile parse incl. dynamic rating keys (reference :92-116);
    absent fields default to '' (safe_extract, :80-85)."""
    data = {
        "fide_id": fide_id,
        "name": "",
        "world_rank": "",
        "federation": "",
        "b_year": "",
        "sex": "",
        "fide_title": "",
        "profile_photo": "",
        "std_rating": "",
        "rapid_rating": "",
        "blitz_rating": "",
    }
    for s in spans:
        if s["kind"] == "media":
            data["profile_photo"] = s["media_ref"]
        elif s["kind"] == "field":
            label, value = s["text"].split("|", 1)
            if label in ("name", "world_rank", "federation", "b_year", "sex", "fide_title"):
                data[label] = value
            elif label in ("std", "rapid", "blitz"):
                # dynamic key f'{rating_type}_rating' (:110-114), digits only
                data[f"{label}_rating"] = "".join(ch for ch in value if ch.isdigit())
    return data


def crawl(cfg: synth.SiteConfig, seeds: list[str] | None = None,
          start_month: str | None = None, end_month: str | None = None):
    """Sequential reference-order crawl over the synthetic site.

    Order (SURVEY.md O5): seeds in list order → search page → for each
    result in page order: profile page, then calc pages months ascending.
    A URL already fetched is skipped (the legacy store-cache semantic,
    reference old_scripts/fide-player-stats-en-US.py:211-231).

    Returns (fetch_order, players, games_raw, games_norm) where
    fetch_order is the list of canonical URLs in fetch sequence.
    """
    months = [m for m in synth.months_of(cfg)
              if (start_month is None or m >= start_month)
              and (end_month is None or m <= end_month)]
    if seeds is None:
        seeds = synth.seed_queries(cfg)
    fetch_order: list[str] = []
    seen: set[str] = set()
    players: list[dict] = []
    games_raw: list[dict] = []

    def fetch(url: str) -> list[dict] | None:
        if url in seen:
            return None
        seen.add(url)
        fetch_order.append(url)
        return synth.render_url(cfg, url)["spans"]

    for q in seeds:
        spans = fetch(synth.search_url(q))
        if spans is None:
            continue
        for p in parse_search(spans):
            pspans = fetch(synth.profile_url(p["id"]))
            if pspans is not None:
                players.append(parse_profile(pspans, p["id"]))
            for m in months:
                cspans = fetch(synth.calc_url(p["id"], m))
                if cspans is not None:
                    games_raw.extend(parse_calc_positional(cspans, p["id"], p["name"]))
    return fetch_order, players, games_raw, normalize_games(games_raw)
