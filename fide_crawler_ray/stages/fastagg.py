"""Partial-aggregate groupby: map-side combine + one small final task.

The guide's "pre-aggregate inside map_batches, then a small groupby"
pattern taken to its conclusion: each batch emits one row per (key,
partial aggregate) — vectorized pandas groupby — and the partials
coalesce in a single final task (one row per distinct key, ~tens of
bytes each). For aggregations whose group count fits one task (up to
~10^8 groups), this avoids the full-dataset all-to-all exchange that
``Dataset.groupby().aggregate()`` performs; beyond that, fall back to
the native Ray Data aggregate (unbounded, sort-based shuffle).

Supported ops: count (rows), sum, min, max, mean (sum+count partials,
divided at the end) — all mergeable, so partial→final is exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def fast_groupby_agg(ds, keys: list[str], aggs: dict[str, tuple[str | None, str]]):
    """aggs: {out_col: (in_col_or_None, 'count'|'sum'|'min'|'max'|'mean')}."""

    def _partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby(list(keys), sort=False, dropna=False)
        cols = {}
        for name, (col, op) in aggs.items():
            if op == "count":
                cols[f"__{name}_c"] = g.size()
            elif op == "sum":
                cols[f"__{name}_s"] = g[col].sum()
            elif op == "min":
                cols[f"__{name}_n"] = g[col].min()
            elif op == "max":
                cols[f"__{name}_x"] = g[col].max()
            elif op == "mean":
                cols[f"__{name}_s"] = g[col].sum()
                cols[f"__{name}_c"] = g[col].count()
            else:
                raise ValueError(op)
        out = pd.DataFrame(cols).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _final(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        g = df.groupby(list(keys), sort=False, dropna=False)
        cols = {}
        for name, (col, op) in aggs.items():
            if op == "count":
                cols[name] = g[f"__{name}_c"].sum()
            elif op == "sum":
                cols[name] = g[f"__{name}_s"].sum()
            elif op == "min":
                cols[name] = g[f"__{name}_n"].min()
            elif op == "max":
                cols[name] = g[f"__{name}_x"].max()
            elif op == "mean":
                cols[name] = g[f"__{name}_s"].sum() / g[f"__{name}_c"].sum()
        out = pd.DataFrame(cols).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = ds.map_batches(_partial, batch_format="pyarrow")
    return partial.repartition(1).map_batches(
        _final, batch_format="pyarrow", batch_size=None
    )
