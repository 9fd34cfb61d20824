"""M18/J3: link cleaning + Levenshtein-ratio fuzzy matching.

Reference semantics (old_scripts/fide-games-scraper-public.py:123-166):
candidate link → strip known URL prefixes, '-' → ' ', then a
Levenshtein ratio against the tournament name; keep the argmax candidate
with ratio > 0 — a null-preserving left-outer enrich.

``ratio`` matches python-Levenshtein's definition: substitution costs 2
(i.e. the indel distance), ratio = (l1 + l2 - d) / (l1 + l2).
"""

from __future__ import annotations

_PREFIXES = (
    "https://", "http://", "www.", "view.livechesscloud.com/#",
    "chess24.com/en/watch/live-tournaments/",
    "lichess.org/broadcast/", "chess.com/events/",
)


def clean_link(link: str) -> str:
    """Strip known URL prefixes and '-' → ' ' (reference :138-143)."""
    s = link
    changed = True
    while changed:
        changed = False
        for p in _PREFIXES:
            if s.startswith(p):
                s = s[len(p):]
                changed = True
    s = s.split("/", 1)[0] if "/" in s else s
    return s.replace("-", " ")


def lev_ratio(a: str, b: str) -> float:
    """Levenshtein ratio with substitution cost 2 (python-Levenshtein
    compatible): 1.0 identical, 0.0 disjoint.

    Two-row DP over plain Python lists — numpy scalar indexing in the
    inner loop was ~10x slower (each cell paid a python→numpy call; the
    fuzzy enrich dropped from ~9.7 s to ~1 s for 88×20 pairs)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        left = i
        for j in range(1, lb + 1):
            sub = prev[j - 1] + (0 if ca == b[j - 1] else 2)
            up = prev[j] + 1
            left = sub if sub < up else up
            c = cur[j - 1] + 1
            if c < left:
                left = c
            cur[j] = left
        prev = cur
    d = prev[lb]
    return (la + lb - d) / (la + lb)


def edit_distance(a: str, b: str) -> int:
    """Plain Levenshtein distance (unit insert/delete/substitute) —
    DuckDB ``levenshtein()``-compatible, unlike lev_ratio's cost-2
    substitutions. Same two-row plain-list DP (see lev_ratio for why
    not numpy)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != b[j - 1]))
        prev = cur
    return prev[lb]


def best_match(name: str, candidates: list[str]) -> tuple[str | None, float]:
    """Argmax Levenshtein ratio over cleaned candidates; (None, 0.0) when
    nothing scores > 0 (reference :144-153)."""
    best, best_r = None, 0.0
    for c in candidates:
        r = lev_ratio(name.lower(), clean_link(c).lower())
        if r > best_r:
            best, best_r = c, r
    return best, best_r


class FuzzyJoiner:
    """J3 as an actor-pool map_batches stage: holds the (small) candidate
    index once per actor; enriches each batch with the best fuzzy match.
    Null-preserving left outer: rows without a match keep nulls."""

    def __init__(self, candidates: list[str]):
        self.candidates = candidates
        self.cleaned = [clean_link(c).lower() for c in candidates]

    def __call__(self, batch):
        import pyarrow as pa

        names = batch["tournament_name"].to_pylist()
        links, ratios = [], []
        for n in names:
            nl = (n or "").lower()
            best, best_r = None, 0.0
            for cand, cl in zip(self.candidates, self.cleaned):
                r = lev_ratio(nl, cl)
                if r > best_r:
                    best, best_r = cand, r
            links.append(best)
            ratios.append(best_r if best is not None else None)
        return batch.append_column(
            "dgt_link", pa.array(links, pa.string())
        ).append_column("dgt_ratio", pa.array(ratios, pa.float64()))
