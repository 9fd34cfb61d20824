"""Scalable session windows: per-key session COUNTS without per-key
Python.

The r1 plan (`groupby(user).map_groups`) costs one Python call per key —
fine at 150 users, unusable at 10^7. This plan is sort-based:

1. globally sort by (key, *order_cols) — Ray's range-partitioned sort,
   the one all-to-all this operator fundamentally needs;
2. per sorted block (``batch_size=None`` → one batch per block), count
   session STARTS vectorized: a row starts a session iff its key differs
   from the previous row's or the time gap exceeds ``gap``; the first
   row of every block provisionally counts as a start;
3. per block also emit one BOUNDARY row (first/last key + timestamp).
   Blocks of a sorted dataset hold disjoint ranges, so ordering the
   boundary rows by their first (key, order) reconstructs block order;
   consecutive boundary pairs where the session actually continues
   across the block edge yield a -1 correction for that key;
4. session count per key = Sum(partial starts ∪ corrections) — a
   partial-agg groupby (fastagg).

Driver-side state is ONE row per block (bounded by block count, not by
data), making this the windowed-aggregate pattern that survives both key
counts and per-key row counts growing with the corpus.

Assumes (key, *order_cols) orders rows totally (e.g. a unique event id
as the last order column) so block order is unambiguous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .fastagg import fast_groupby_agg


def sessionize_counts(ds, key_col: str, ts_col: str, order_cols: list[str],
                      gap_seconds: float):
    """Dataset → Dataset(key_col, n_sessions:int64). See module docstring."""
    sorted_ds = ds.sort([key_col, ts_col, *order_cols]).materialize()
    gap_ns = int(gap_seconds * 1e9)

    base = sorted_ds.schema().base_schema
    if isinstance(base, pa.Schema):
        key_type = base.field(key_col).type
    else:  # pandas-block dataset (from_pandas): numpy dtype → arrow
        key_type = pa.from_numpy_dtype(
            np.dtype(base.types[list(base.names).index(key_col)])
        )

    def _starts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key_col: pa.array([], key_type),
                             "__s": pa.array([], pa.int64())})
        df = b.to_pandas()
        ts = df[ts_col].astype("datetime64[ns]").astype("int64").to_numpy()
        keys = df[key_col].to_numpy()
        new_key = np.empty(len(df), dtype=bool)
        new_key[0] = True  # block-first row: provisional start (see _fix)
        new_key[1:] = keys[1:] != keys[:-1]
        big_gap = np.empty(len(df), dtype=bool)
        big_gap[0] = True
        big_gap[1:] = (ts[1:] - ts[:-1]) > gap_ns
        start = new_key | big_gap
        out = (pd.DataFrame({key_col: keys, "__s": start.astype("int64")})
               .groupby(key_col, sort=False)["__s"].sum().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False) \
            .replace_schema_metadata(None)

    def _boundary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"first_key": pa.array([], key_type),
                             "first_ts": pa.array([], pa.int64()),
                             "last_key": pa.array([], key_type),
                             "last_ts": pa.array([], pa.int64()),
                             **{f"first_{c}": pa.array([], pa.int64())
                                for c in order_cols}})
        df = b.to_pandas()
        ts = df[ts_col].astype("datetime64[ns]").astype("int64")
        row = {
            "first_key": [df[key_col].iloc[0]],
            "first_ts": [int(ts.iloc[0])],
            "last_key": [df[key_col].iloc[-1]],
            "last_ts": [int(ts.iloc[-1])],
        }
        for c in order_cols:
            row[f"first_{c}"] = [df[c].iloc[0]]
        return pa.table(row)

    starts = sorted_ds.map_batches(_starts, batch_format="pyarrow",
                                   batch_size=None)

    # boundary stitch: one row per block → bounded driver combine
    bounds = sorted_ds.map_batches(_boundary, batch_format="pyarrow",
                                   batch_size=None).to_pandas()
    bounds = bounds.sort_values(
        ["first_key", "first_ts"] + [f"first_{c}" for c in order_cols],
        kind="mergesort",
    ).reset_index(drop=True)
    corr_keys = []
    for i in range(1, len(bounds)):
        prev, cur = bounds.iloc[i - 1], bounds.iloc[i]
        if (cur["first_key"] == prev["last_key"]
                and cur["first_ts"] - prev["last_ts"] <= gap_ns):
            corr_keys.append(cur["first_key"])  # block-edge continuation
    if corr_keys:
        import ray.data as rd

        corr = rd.from_arrow(pa.table({
            key_col: pa.array(corr_keys, starts.schema().base_schema
                              .field(key_col).type),
            "__s": pa.array([-1] * len(corr_keys), pa.int64()),
        }))
        starts = starts.union(corr)

    return fast_groupby_agg(starts, [key_col], {"n_sessions": ("__s", "sum")})
