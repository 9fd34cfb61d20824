"""Exact windowed dedup (D1/D2) as a hash-partitioned groupby.

Reference semantics (database/database_management.py:56-71): ROW_NUMBER()
OVER (PARTITION BY date, tournament_name, player_name, opponent_name,
result ORDER BY id), keep rn=1 — i.e. keep the first-inserted row per
5-column key. The engine carries an explicit ``lineage`` column
(crawl-order monotone, stages/parse.py) instead of an autoincrement id.

Scale design: the shuffle key is a 64-bit hash of the 5-col key (one
narrow column shuffles instead of five wide ones); within each hash
group a vectorized pandas ``sort_values(lineage).drop_duplicates(key)``
resolves both hash collisions and the keep-first tiebreak exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..schema import DEDUP_KEY


def add_key_hash_batch(batch: pa.Table, key_cols=DEDUP_KEY) -> pa.Table:
    """Vectorized 64-bit content hash over the key columns."""
    n = batch.num_rows
    parts = []
    for c in key_cols:
        col = batch[c].cast(pa.string()).to_pandas().fillna("\x00null")
        parts.append(col)
    joined = parts[0].str.cat(parts[1:], sep="\x1f")
    h = pd.util.hash_array(joined.to_numpy(dtype=object)).astype(np.int64)
    return batch.append_column("key_hash", pa.array(h, pa.int64()))


def keep_first_group(g: pd.DataFrame, key_cols=DEDUP_KEY, order_col: str = "lineage") -> pd.DataFrame:
    """Per hash-group exact keep-first (handles hash collisions by
    deduplicating on the real key columns)."""
    g = g.sort_values(order_col, kind="mergesort")
    return g.drop_duplicates(subset=list(key_cols), keep="first")


def dedup_dataset(ds, key_cols=DEDUP_KEY, order_col: str = "lineage"):
    """D1 over a Dataset: add key_hash → groupby(key_hash) → keep first."""
    ds = ds.map_batches(
        lambda b: add_key_hash_batch(b, key_cols), batch_format="pyarrow"
    )
    return ds.groupby("key_hash").map_groups(
        lambda g: keep_first_group(g, key_cols, order_col), batch_format="pandas"
    ).drop_columns(["key_hash"])
