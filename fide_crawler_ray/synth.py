"""Deterministic synthetic FIDE-like site — the fetch stand-in (no network).

The sandbox has no network, so the reference's HTTP sources
(reference: data_processing/data_fetching_processing.py:17-43 search,
:88-89 profile, :147 calc) are replaced by a *page generator*: every URL
deterministically renders to an interleaved text+media span document
(schema.DOCUMENTS). Rendering is a pure function of (config, url) so any
worker can materialize any page without shared state — this is what lets
the fetch stage scale as a stateless ``map_batches`` over URL batches.

Document shapes mirror the three reference page types (FIXTURES.md F1):

- **search** pages: one 'field' span per result, text = "name|title|href",
  including decoy hrefs (news links, non-profile links) to exercise the
  URL predicate `'profile' in url and 'news' not in url`
  (reference: data_fetching_processing.py:68).
- **profile** pages: 'field' spans "label|value" for the six profile
  fields, dynamic-key rating fields ("std|2750", ...; some players lack
  blitz — reference: data_fetching_processing.py:110-114 iterates only
  the rating blocks that exist), and one 'media' span with a data-URI
  photo ref (reference: data_fetching_processing.py:103-107).
- **calc** pages: per tournament block the span sequence
  header("name|date") → colheader → rating("2680") → limiter →
  [game("opp|rating|country|result|chg|k|k_chg"), media(clr_wh/clr_bl)]*
  with an optional trailing 'footnote' span. This reproduces the
  positional layout the reference parses (header at limiter-3, rating at
  limiter-1, games from limiter+1 to next_limiter-3:
  data_fetching_processing.py:149-194), with media spans interleaved in
  document order exactly as the img tags the reference zips by index
  (:156-162, colorIndex at :194).

Dirty-data knobs reproduce the reference's observed edge cases: ratings
like "2441 *" (cleaned at :200-201), missing fields that become nulls and
are dropped (:192, :257), duplicate tournament blocks repeated across
month pages (dedup key database_management.py:63), months with no
calc_table at all (:150 ``if fullTable is not None``).
"""

from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass, field
from datetime import date

from .schema import FOOTNOTE_TEXT

SEARCH_HOST = "fide.com"
RATINGS_HOST = "ratings.fide.com"


@dataclass(frozen=True)
class SiteConfig:
    seed: int = 42
    n_players: int = 8
    n_queries: int = 3           # players share surnames Surname0..Surname{n-1}
    start_month: str = "2022-01-01"
    n_months: int = 12
    max_tournaments_per_month: int = 2
    games_lo: int = 3
    games_hi: int = 7
    dirty_rate: float = 0.08     # "2441 *" style opponent ratings
    null_rate: float = 0.04      # a game row missing a field (→ dropna)
    dup_rate: float = 0.15       # tournament repeated on next month's page
    empty_month_rate: float = 0.15  # month page with no calc_table
    footnote_rate: float = 0.5
    decoys_per_search: int = 2
    robots_disallow: tuple = (("fide.com", "/news"),)
    # deterministic transient-fetch fault model (0 = off): every URL with
    # crc32(url) % fault_every == 0 fails its first `fault_attempts`
    # fetch attempts — the sandbox stand-in for HTTP timeouts / 5xx
    fault_every: int = 0
    fault_attempts: int = 2


# ---------------------------------------------------------------- URLs

def search_url(query: str) -> str:
    return f"https://{SEARCH_HOST}/search?query={query}"


def profile_url(fide_id: str) -> str:
    return f"https://{RATINGS_HOST}/profile/{fide_id}"


def calc_url(fide_id: str, period: str) -> str:
    return (
        f"https://{RATINGS_HOST}/a_indv_calculations.php"
        f"?id_number={fide_id}&rating_period={period}&t=0"
    )


def robots_url(host: str) -> str:
    return f"https://{host}/robots.txt"


@__import__("functools").lru_cache(maxsize=512)
def _solid_jpeg_b64(w: int, h: int, rgb: tuple[int, int, int]) -> str:
    """Base64 of a real solid-color baseline JPEG (quality 95 — solid
    colors round-trip the stages/jpeg.py codec bit-exactly at that
    quantization; pinned by tests). Cached: the palette is 4·3 dims ×
    27 colors, so page generation pays the encoder at most 324 times
    per process regardless of crawl size."""
    import base64 as _b64

    import numpy as np

    from .stages.jpeg import jpeg_encode_baseline

    arr = np.full((h, w, 3), rgb, dtype=np.uint8)
    return _b64.b64encode(jpeg_encode_baseline(arr, quality=95)).decode()


# ------------------------------------------------------------ determinism

def _rng_int(*parts) -> int:
    h = hashlib.sha1("|".join(str(p) for p in parts).encode()).digest()
    return int.from_bytes(h[:8], "big")


class _R:
    """Tiny deterministic PRNG (splitmix-style) seeded from stable parts."""

    def __init__(self, *parts):
        self.s = _rng_int(*parts)

    def next(self) -> int:
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return self.s >> 16

    def randint(self, lo: int, hi: int) -> int:  # inclusive
        return lo + self.next() % (hi - lo + 1)

    def random(self) -> float:
        return self.next() / float(1 << 48)

    def choice(self, seq):
        return seq[self.next() % len(seq)]


# ------------------------------------------------------------ site model

_TITLES = ["GM", "IM", "FM", "CM", "Sem título"]
_FEDS = ["BRA", "IND", "USA", "NOR", "GER", "FRA", "ESP", "RUS"]
_COUNTRIES = ["BRA", "IND", "USA", "NOR", "GER", "FRA", "ESP", "CHN", ""]
_RESULTS = ["0.0", "0.5", "1.0"]


def months_of(cfg: SiteConfig) -> list[str]:
    y, m, _ = (int(x) for x in cfg.start_month.split("-"))
    out = []
    for i in range(cfg.n_months):
        yy, mm = y + (m - 1 + i) // 12, (m - 1 + i) % 12 + 1
        out.append(f"{yy:04d}-{mm:02d}-01")
    return out


def player_ids(cfg: SiteConfig) -> list[str]:
    return [str(100000 + i) for i in range(cfg.n_players)]


def player_name(cfg: SiteConfig, fide_id: str) -> str:
    i = int(fide_id) - 100000
    return f"Player{i} Surname{i % cfg.n_queries}"


def player_title(cfg: SiteConfig, fide_id: str) -> str:
    return _TITLES[_rng_int(cfg.seed, "title", fide_id) % len(_TITLES)]


def player_base_rating(cfg: SiteConfig, fide_id: str) -> int:
    return 2300 + _rng_int(cfg.seed, "rating", fide_id) % 500


def seed_queries(cfg: SiteConfig) -> list[str]:
    return [f"Surname{k}" for k in range(cfg.n_queries)]


def players_for_query(cfg: SiteConfig, query: str) -> list[str]:
    """Matching fide_ids in id order (the order search results render in)."""
    return [
        pid
        for pid in player_ids(cfg)
        if player_name(cfg, pid).endswith(" " + query)
    ]


# ------------------------------------------------------------- rendering

def _span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _finish(doc_id: str, kind: str, spans: list[dict]) -> dict:
    for i, s in enumerate(spans):
        s["offset"] = i
    return {"doc_id": doc_id, "kind": kind, "spans": spans}


def render_search(cfg: SiteConfig, query: str) -> dict:
    url = search_url(query)
    r = _R(cfg.seed, "search", query)
    spans: list[dict] = []
    results = players_for_query(cfg, query)
    for pid in results:
        spans.append(
            _span("field", f"{player_name(cfg, pid)}|{player_title(cfg, pid)}|/profile/{pid}")
        )
        # decoy entries interleaved after real results
        for d in range(cfg.decoys_per_search):
            if r.random() < 0.6:
                kind_decoy = r.choice(
                    [
                        f"https://{SEARCH_HOST}/news/article-{r.randint(1, 999)}",
                        f"https://{SEARCH_HOST}/calendar/event-{r.randint(1, 999)}",
                        f"/profile/news/{r.randint(1, 999)}",  # has profile AND news → rejected
                    ]
                )
                spans.append(_span("field", f"Decoy Item {r.randint(1, 99)}|—|{kind_decoy}"))
    return _finish(url, "search", spans)


def render_profile(cfg: SiteConfig, fide_id: str) -> dict:
    url = profile_url(fide_id)
    r = _R(cfg.seed, "profile", fide_id)
    base = player_base_rating(cfg, fide_id)
    name = player_name(cfg, fide_id)
    spans = [
        _span("field", f"name|{name}"),
        _span("field", f"world_rank|{r.randint(1, 5000)}"),
        _span("field", f"federation|{r.choice(_FEDS)}"),
        _span("field", f"b_year|{r.randint(1980, 2010)}"),
        _span("field", f"sex|{r.choice(['Male', 'Female'])}"),
        _span("field", f"fide_title|{player_title(cfg, fide_id)}"),
    ]
    # photo: REAL baseline JPEG (r4 — was a fake byte payload): a solid-
    # color image whose dims/color derive deterministically from the
    # digest, drawn from a small palette so the encoder runs once per
    # (dims, color) via _solid_jpeg's cache. The decode stages downstream
    # therefore exercise the real pure-python JPEG path end to end.
    d = hashlib.sha1(f"{cfg.seed}|photo|{fide_id}".encode()).digest()
    w = 64 + 32 * (d[0] % 4)
    h = 64 + 32 * (d[1] % 3)
    rgb = (32 + 96 * (d[2] % 3), 32 + 96 * (d[3] % 3), 32 + 96 * (d[4] % 3))
    b64 = _solid_jpeg_b64(w, h, rgb)
    spans.append(_span("media", "", f"data:image/jpeg;base64,{b64}"))
    spans.append(_span("field", f"std|{base}"))
    spans.append(_span("field", f"rapid|{base - r.randint(0, 80)}"))
    if r.random() > 0.25:  # some players have no blitz rating block
        spans.append(_span("field", f"blitz|{base - r.randint(0, 120)}"))
    return _finish(url, "profile", spans)


def _month_tournaments(cfg: SiteConfig, fide_id: str, period: str) -> list[dict]:
    """Tournament blocks native to this (player, month) page."""
    r = _R(cfg.seed, "calc", fide_id, period)
    if r.random() < cfg.empty_month_rate:
        return []
    n_t = r.randint(1, cfg.max_tournaments_per_month)
    y, m, _ = (int(x) for x in period.split("-"))
    blocks = []
    for t in range(n_t):
        tname = f"Tournament {period[:7]} #{t} ({fide_id})"
        day = r.randint(25, 28)
        tdate = f"{y:04d}-{m:02d}-{day:02d}"
        rating = str(player_base_rating(cfg, fide_id) + r.randint(-30, 30))
        games = []
        for g in range(r.randint(cfg.games_lo, cfg.games_hi)):
            opp = f"Opponent {r.randint(1, 400)}"
            opp_rating = str(2000 + r.randint(0, 800))
            if r.random() < cfg.dirty_rate:
                opp_rating = opp_rating + " *"  # cleaned by M10
            country = r.choice(_COUNTRIES)
            result = r.choice(_RESULTS)
            chg = f"{(r.randint(-200, 200)) / 10.0:.1f}"
            k = r.choice(["10", "20", "40"])
            k_chg = f"{(r.randint(-80, 80)) / 10.0:.2f}"
            if r.random() < cfg.null_rate:
                # one required field missing → NaN → dropna drops the row
                country = ""
                chg = ""
            color = "white" if r.random() < 0.5 else "black"
            games.append(
                {
                    "opponent_name": opp,
                    "opponent_rating": opp_rating,
                    "country": country,
                    "result": result,
                    "chg": chg,
                    "k": k,
                    "k_chg": k_chg,
                    "color": color,
                }
            )
        blocks.append(
            {
                "tournament_name": tname,
                "date": tdate,
                "player_rating": rating,
                "games": games,
                "dup_next_month": r.random() < cfg.dup_rate,
            }
        )
    return blocks


def _prev_month(period: str) -> str | None:
    y, m, _ = (int(x) for x in period.split("-"))
    y, m = (y - 1, 12) if m == 1 else (y, m - 1)
    return f"{y:04d}-{m:02d}-01"


def calc_blocks(cfg: SiteConfig, fide_id: str, period: str) -> list[dict]:
    """All blocks on this month page: native ones plus any block the
    previous month flagged for repetition (duplicate-key generator)."""
    blocks = []
    prev = _prev_month(period)
    if prev is not None:
        for b in _month_tournaments(cfg, fide_id, prev):
            if b["dup_next_month"]:
                blocks.append(b)
    blocks.extend(_month_tournaments(cfg, fide_id, period))
    return blocks


def render_calc(cfg: SiteConfig, fide_id: str, period: str) -> dict:
    url = calc_url(fide_id, period)
    blocks = calc_blocks(cfg, fide_id, period)
    if not blocks:
        # no calc_table on the page (reference skips: fullTable is None)
        return _finish(url, "calc", [])
    spans: list[dict] = []
    for b in blocks:
        spans.append(_span("header", f"{b['tournament_name']}|{b['date']}"))
        spans.append(_span("colheader", ""))
        spans.append(_span("rating", b["player_rating"]))
        spans.append(_span("limiter", ""))
        for g in b["games"]:
            spans.append(
                _span(
                    "game",
                    "|".join(
                        [
                            g["opponent_name"],
                            g["opponent_rating"],
                            g["country"],
                            g["result"],
                            g["chg"],
                            g["k"],
                            g["k_chg"],
                        ]
                    ),
                )
            )
            ref = "clr_wh16.gif" if g["color"] == "white" else "clr_bl16.gif"
            spans.append(_span("media", "", ref))
    r = _R(cfg.seed, "footnote", fide_id, period)
    if r.random() < cfg.footnote_rate:
        spans.append(_span("footnote", FOOTNOTE_TEXT))
    return _finish(url, "calc", spans)


def render_robots(cfg: SiteConfig, host: str) -> dict:
    url = robots_url(host)
    rules = [path for h, path in cfg.robots_disallow if h == host]
    spans = [_span("field", f"disallow|{p}") for p in rules]
    return _finish(url, "robots", spans)


class TransientFetchError(RuntimeError):
    """Deterministic synthetic transient fetch failure — the sandbox
    stand-in for an HTTP timeout / 5xx. The reference blocks and retries
    these inline in the fetch slot
    (old_scripts/fide-games-scraper-public.py:48 sleeps 10 s and
    retries), which is also what keeps crawl ordering exact here."""


def fetch_url(cfg: SiteConfig, url: str, attempt: int = 0) -> dict:
    """render_url behind the fault model: the selected URLs fail their
    first ``cfg.fault_attempts`` attempts, then succeed — so a retrying
    fetcher produces BIT-IDENTICAL output to a fault-free run."""
    if (cfg.fault_every and attempt < cfg.fault_attempts
            and zlib.crc32(url.encode()) % cfg.fault_every == 0):
        raise TransientFetchError(url)
    return render_url(cfg, url)


def render_url(cfg: SiteConfig, url: str) -> dict:
    """Pure URL → span document. Unknown URLs render as empty 'news' docs
    (the crawler should never fetch them; doing so is not an error)."""
    if url.endswith("/robots.txt"):
        host = url.split("//", 1)[1].split("/", 1)[0]
        return render_robots(cfg, host)
    if "/search?query=" in url:
        return render_search(cfg, url.rsplit("query=", 1)[1])
    if "a_indv_calculations.php" in url:
        q = url.rsplit("?", 1)[1]
        params = dict(kv.split("=", 1) for kv in q.split("&"))
        return render_calc(cfg, params["id_number"], params["rating_period"])
    if "/profile/" in url and "news" not in url:
        return render_profile(cfg, url.rstrip("/").rsplit("/", 1)[1])
    return _finish(url, "news", [])


def site_sf(sf: float) -> SiteConfig:
    """Scale-factor → config used by entry()/queries()/bench: deterministic,
    roughly linear in page count."""
    n_players = max(4, int(40 * sf * 10))
    return SiteConfig(
        seed=42,
        n_players=n_players,
        n_queries=max(2, n_players // 4),
        n_months=24,
    )
