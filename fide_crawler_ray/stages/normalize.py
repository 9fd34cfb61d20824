"""Normalization of raw game rows → typed GAME_HISTORY (M10-M12, D3).

Vectorized pyarrow.compute equivalents of the reference's pandas
coercions (reference: data_processing/data_fetching_processing.py:200-202
and :247-259): strip non-digits from opponent_rating then numeric-coerce,
float-cast result/chg/k_chg, int-cast player_rating/k, drop rows with any
null in the required columns (dropna), date kept as ISO string (the
reference round-trips datetime → SQLite TEXT; ISO strings sort
identically to the datetimes).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

REQUIRED = [
    "fide_id", "date", "tournament_name", "country", "player_name",
    "player_rating", "player_color", "opponent_name", "opponent_rating",
    "result", "chg", "k", "k_chg",
]


def _num(arr: pa.ChunkedArray | pa.Array, typ: pa.DataType) -> pa.Array:
    """to_numeric(errors='coerce'): '' and junk → null, else cast."""
    arr = pc.utf8_trim_whitespace(arr)
    arr = pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)
    # cast through float64 so '12.5' → int fails soft only where needed
    try:
        return pc.cast(arr, typ)
    except pa.ArrowInvalid:
        f = pc.cast(arr, pa.float64(), safe=False)
        return pc.cast(f, typ, safe=False)


def normalize_games_batch(batch: pa.Table) -> pa.Table:
    """GAME_RAW(+lineage) batch → typed GAME_HISTORY(+lineage) batch."""
    n = batch.num_rows
    if n == 0:
        return _empty()
    opp = pc.replace_substring_regex(batch["opponent_rating"], r"\D", "")  # M10 (:200)
    opp = pc.if_else(pc.equal(opp, ""), pa.nulls(n, pa.string()), opp)
    cols = {
        "fide_id": batch["fide_id"],
        "date": batch["date"],
        "tournament_name": batch["tournament_name"],
        "country": batch["country"],
        "player_name": batch["player_name"],
        "player_rating": _num(batch["player_rating"], pa.int32()),
        "player_color": batch["player_color"],
        "opponent_name": batch["opponent_name"],
        "opponent_rating": pc.cast(pc.cast(opp, pa.float64(), safe=False), pa.int32(), safe=False),
        "result": _num(batch["result"], pa.float32()),  # M11 (:202)
        "chg": _num(batch["chg"], pa.float32()),
        "k": _num(batch["k"], pa.int32()),
        "k_chg": _num(batch["k_chg"], pa.float32()),
        "lineage": batch["lineage"],
    }
    # NOTE: no dropna here — the reference deduplicates BEFORE the final
    # dropna (:255 then :257), so D3 runs as drop_null_batch after dedup.
    return pa.table(cols)


def drop_null_batch(batch: pa.Table) -> pa.Table:
    """D3 dropna (:257): any null/empty in a required column drops the row."""
    mask = None
    for c in REQUIRED:
        valid = pc.is_valid(batch[c])
        if batch[c].type == pa.string():
            valid = pc.and_(valid, pc.not_equal(batch[c], ""))
        mask = valid if mask is None else pc.and_(mask, valid)
    return batch.filter(mask)


def _empty() -> pa.Table:
    from ..schema import GAME_HISTORY

    t = GAME_HISTORY.empty_table()
    return t.append_column("lineage", pa.array([], pa.int64()))
