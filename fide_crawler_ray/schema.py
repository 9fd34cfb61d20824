"""Arrow schemas for every table the engine reads or writes.

Derived from the reference's observable data shapes (SURVEY.md §1):

- ``DOCUMENTS``   interleaved text+media span documents — the flagship input
  (BASELINE.json ``input_hint``); span order is load-bearing because the
  reference zips img media spans with text rows positionally
  (reference: data_processing/data_fetching_processing.py:149-194).
- ``URLS``        frontier rows (engine-internal, checkpointed).
- ``PLAYER_DATA`` the reference's player profile store
  (reference: database/database_management.py:8-22).
- ``GAME_HISTORY`` the reference's per-game store, typed per its
  normalize step (reference: database/database_management.py:25-43 and
  data_processing/data_fetching_processing.py:247-259).
- ``SEEDS``       seed queries (crawl entry input).
"""

from __future__ import annotations

import pyarrow as pa

# Span kinds (FIXTURES.md F1). 'colheader' mirrors the column-header row that
# sits between the tournament header row and the player-rating row in the
# reference's positional table (header at limiter-3, colheader at limiter-2,
# rating at limiter-1: data_fetching_processing.py:167-169).
SPAN_KINDS = (
    "header",     # tournament header: "tournament_name|date"
    "colheader",  # positional filler (column-header row in the reference table)
    "rating",     # player rating row: "player_rating"
    "limiter",    # all-null separator row (data_fetching_processing.py:154-155)
    "game",       # one game row: "opponent|opp_rating|country|result|chg|k|k_chg"
    "media",      # img span; media_ref = 'clr_wh16.gif'/'clr_bl16.gif'/data-URI
    "field",      # profile/search field: "label|value" or "name|title|href"
    "footnote",   # "*  Rating difference of more than 400." (must be dropped)
)

SPAN = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOCUMENTS = pa.schema(
    [
        pa.field("doc_id", pa.string()),   # canonical URL
        pa.field("kind", pa.string()),     # 'search' | 'profile' | 'calc' | 'robots' | 'news'
        pa.field("spans", pa.list_(SPAN)),
    ]
)

URLS = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("host", pa.string()),
        pa.field("url_hash", pa.binary(20)),  # SHA1 of canonical URL
        pa.field("kind", pa.string()),        # 'search' | 'profile' | 'calc'
        pa.field("fide_id", pa.string()),     # '' when n/a
        pa.field("period", pa.string()),      # 'YYYY-MM-01' or ''
        pa.field("priority", pa.int64()),     # encodes (seed_rank, fide_id, month)
        pa.field("next_fetch_vts", pa.int64()),  # politeness heap key (virtual µs)
    ]
)

PLAYER_DATA = pa.schema(
    [
        pa.field("fide_id", pa.string()),
        pa.field("name", pa.string()),
        pa.field("world_rank", pa.string()),
        pa.field("federation", pa.string()),
        pa.field("b_year", pa.string()),
        pa.field("sex", pa.string()),
        pa.field("fide_title", pa.string()),
        pa.field("profile_photo", pa.string()),  # data-URI media ref
        pa.field("std_rating", pa.string()),
        pa.field("rapid_rating", pa.string()),
        pa.field("blitz_rating", pa.string()),
    ]
)

GAME_HISTORY = pa.schema(
    [
        pa.field("fide_id", pa.string()),
        pa.field("date", pa.string()),            # ISO 'YYYY-MM-DD'
        pa.field("tournament_name", pa.string()),
        pa.field("country", pa.string()),
        pa.field("player_name", pa.string()),
        pa.field("player_rating", pa.int32()),
        pa.field("player_color", pa.string()),    # 'white' | 'black'
        pa.field("opponent_name", pa.string()),
        pa.field("opponent_rating", pa.int32()),
        pa.field("result", pa.float32()),         # 0.0 | 0.5 | 1.0
        pa.field("chg", pa.float32()),
        pa.field("k", pa.int32()),
        pa.field("k_chg", pa.float32()),
    ]
)

# Raw (pre-normalize) game rows as the parser emits them: strings still dirty
# ("2441 *" ratings), date from the header span, dropna not yet applied.
GAME_RAW = pa.schema(
    [
        pa.field("fide_id", pa.string()),
        pa.field("date", pa.string()),
        pa.field("tournament_name", pa.string()),
        pa.field("country", pa.string()),
        pa.field("player_name", pa.string()),
        pa.field("player_rating", pa.string()),
        pa.field("player_color", pa.string()),
        pa.field("opponent_name", pa.string()),
        pa.field("opponent_rating", pa.string()),
        pa.field("result", pa.string()),
        pa.field("chg", pa.string()),
        pa.field("k", pa.string()),
        pa.field("k_chg", pa.string()),
    ]
)

SEEDS = pa.schema(
    [
        pa.field("query", pa.string()),
        pa.field("seed_rank", pa.int32()),
    ]
)

# The 5-column logical dedup key of game_history
# (reference: database/database_management.py:63).
DEDUP_KEY = ("date", "tournament_name", "player_name", "opponent_name", "result")

FOOTNOTE_TEXT = "*  Rating difference of more than 400."


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
