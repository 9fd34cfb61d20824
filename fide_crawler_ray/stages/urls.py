"""URL canonicalization, hashing, classification, frontier expansion.

- Canonicalize + SHA1 ``url_hash`` feeds the sharded URL-seen filters
  (BASELINE.json north_star: "keyed by canonicalized+SHA1-hashed URLs").
- The classifier predicate reproduces the reference's
  ``'profile' in url and 'news' not in url``
  (reference: data_processing/data_fetching_processing.py:68) and the id
  regex ``/profile/(\\d+)`` (reference :64-65).
- ``priority`` packs (seed_rank, result_idx, kind, month) into one int64
  so that ascending priority == the reference's sequential crawl order
  (SURVEY.md O5: months ascending per player (reference :128-131, :140),
  players in search-result order (reference :49-74), seeds in list order).
"""

from __future__ import annotations

import hashlib
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import numpy as np
import pyarrow as pa

KIND_SEARCH, KIND_PROFILE, KIND_CALC = 0, 1, 2
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize(url: str, base_host: str = "", base_scheme: str = "https") -> str:
    """Deterministic canonical form: lowercase scheme/host, default port
    stripped, fragment dropped, query keys sorted, trailing slash trimmed.
    Relative URLs resolve against ``base_host``."""
    if url.startswith("/"):
        url = f"{base_scheme}://{base_host}{url}"
    scheme, netloc, path, query, _frag = urlsplit(url)
    scheme = scheme.lower() or "https"
    netloc = netloc.lower()
    if ":" in netloc:
        host, port = netloc.rsplit(":", 1)
        if port == _DEFAULT_PORTS.get(scheme):
            netloc = host
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if query:
        query = urlencode(sorted(parse_qsl(query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path or "/", query, ""))


def sha1_url(url: str) -> bytes:
    return hashlib.sha1(url.encode()).digest()


def host_of(url: str) -> str:
    return urlsplit(url).netloc.lower()


def pack_priority(seed_rank: int, result_idx: int, kind: int, month_idx: int) -> int:
    """seed_rank(12b) | result_idx(16b) | kind(2b) | month_idx(16b) → <2^46,
    leaving 16 low bits free for the span-offset lineage suffix.
    result_idx 0 is the search page itself; results are 1-based.

    Range-guarded: a field overflowing its bit width would silently bleed
    into higher fields, corrupting crawl ordering and the lineage
    tiebreak (fetch_log merging sorts by priority)."""
    if not (0 <= seed_rank < (1 << 12) and 0 <= result_idx < (1 << 16)
            and 0 <= kind < (1 << 2) and 0 <= month_idx < (1 << 16)):
        raise ValueError(
            f"pack_priority field out of range: seed_rank={seed_rank} "
            f"result_idx={result_idx} kind={kind} month_idx={month_idx}"
        )
    return (seed_rank << 34) | (result_idx << 18) | (kind << 16) | month_idx


def month_index(period: str) -> int:
    """Months since 1900-01 (fits 16 bits until year 7361)."""
    y, m = int(period[:4]), int(period[5:7])
    return (y - 1900) * 12 + m


def url_keep_mask(urls: pa.Array) -> np.ndarray:
    """Vectorized M2 predicate: keep 'profile' in url AND 'news' not in url
    (reference data_fetching_processing.py:68)."""
    import pyarrow.compute as pc

    has_profile = pc.match_substring(urls, "profile")
    has_news = pc.match_substring(urls, "news")
    return pc.and_(has_profile, pc.invert(has_news)).to_numpy(zero_copy_only=False)


def extract_profile_ids(urls: pa.Array) -> pa.Array:
    """Vectorized M3: regex /profile/(\\d+) → id, default 'Sem ID'
    (reference data_fetching_processing.py:64-65)."""
    import pyarrow.compute as pc

    extracted = pc.extract_regex(urls, r"/profile/(?P<id>\d+)")
    ids = pc.struct_field(extracted, "id")
    return pc.fill_null(ids, "Sem ID")


def make_url_rows(
    urls: list[str],
    kinds: list[str],
    fide_ids: list[str],
    periods: list[str],
    player_names: list[str],
    priorities: list[int],
) -> pa.Table:
    """Build a URLS-schema table (+player_name) with canonical url, host,
    sha1 hash; vectorized where pyarrow has kernels, tight loop otherwise."""
    canon = [canonicalize(u) for u in urls]
    return pa.table(
        {
            "url": pa.array(canon, pa.string()),
            "host": pa.array([host_of(u) for u in canon], pa.string()),
            "url_hash": pa.array([sha1_url(u) for u in canon], pa.binary(20)),
            "kind": pa.array(kinds, pa.string()),
            "fide_id": pa.array(fide_ids, pa.string()),
            "period": pa.array(periods, pa.string()),
            "player_name": pa.array(player_names, pa.string()),
            "priority": pa.array(priorities, pa.int64()),
            "next_fetch_vts": pa.array([0] * len(canon), pa.int64()),
        }
    )
