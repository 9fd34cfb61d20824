"""Partial-aggregate groupby: map-side combine + a cardinality-guarded
final stage.

The guide's "pre-aggregate inside map_batches, then a small groupby"
pattern taken to its conclusion: each batch emits one row per (key,
partial aggregate) — vectorized pandas groupby — and the partials
coalesce in a final stage. Two final plans, chosen automatically from
the measured partial cardinality (no manual switching):

- **single-task combine** (default, partial rows ≤ ``max_combine_rows``):
  ``repartition(1)`` + one vectorized groupby — one row per distinct key,
  ~tens of bytes each, so even 10^6-key aggregations finish in one small
  task with no all-to-all exchange of the input.
- **native hash-aggregate fallback** (partial rows above the threshold):
  ``Dataset.groupby().aggregate()`` over the *partials* — an all-to-all,
  but of the pre-combined partial table (one row per key per input
  block), never of the raw input. This is the path that survives
  group counts growing linearly with data (a10 per-orderkey rollups,
  tumbling/sliding windows) on a 100-TB input.

Both plans produce identical output (all ops are mergeable: count, sum,
min, max, and mean as sum+count partials divided at the end) —
``tests/test_fastagg_fallback.py`` pins this.

The guard measures ``partial.count()`` — the sum of per-batch distinct
key counts, an upper bound on true key cardinality that is already
materialized (the combine needs the partials anyway), so the estimate is
free.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# Above this many partial rows, the single-task combine becomes the
# bottleneck (and eventually an OOM): switch to the native hash
# aggregate over the partials. 4M rows × ~50 B ≈ 200 MB — comfortably
# one task below the threshold, clearly shuffle territory above it.
DEFAULT_MAX_COMBINE_ROWS = 4_000_000


def fast_groupby_agg(ds, keys: list[str], aggs: dict[str, tuple[str | None, str]],
                     max_combine_rows: int = DEFAULT_MAX_COMBINE_ROWS):
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

    partial = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    if partial.count() <= max_combine_rows:
        return partial.repartition(1).map_batches(
            _final, batch_format="pyarrow", batch_size=None
        )
    return _native_combine(partial, keys, aggs)


def _native_combine(partial, keys, aggs):
    """Fallback final plan: native hash aggregate over the partial table
    (sum/min/max of the partial columns are exactly the merge functions),
    then a vectorized finalize pass for renames and mean division.

    The finalize pass also normalizes empty blocks: Ray's hash-shuffle
    aggregate emits ZERO-COLUMN empty blocks for partitions with no
    keys, and those poison any downstream join ("No match for FieldRef"
    inside the Acero join) — every empty batch is rewritten to an empty
    table with the real output schema, derived from the partial schema."""
    from ray.data.aggregate import Max, Min, Sum

    pschema: pa.Schema = partial.schema().base_schema
    out_fields = [(k, pschema.field(k).type) for k in keys]
    for name, (_col, op) in aggs.items():
        if op == "count":
            out_fields.append((name, pa.int64()))
        elif op == "sum":
            out_fields.append((name, pschema.field(f"__{name}_s").type))
        elif op == "min":
            out_fields.append((name, pschema.field(f"__{name}_n").type))
        elif op == "max":
            out_fields.append((name, pschema.field(f"__{name}_x").type))
        elif op == "mean":
            out_fields.append((name, pa.float64()))
    out_schema = pa.schema(out_fields)

    native = []
    for name, (_col, op) in aggs.items():
        if op in ("count", "mean"):
            native.append(Sum(f"__{name}_c", alias_name=f"__{name}_c"))
        if op in ("sum", "mean"):
            native.append(Sum(f"__{name}_s", alias_name=f"__{name}_s"))
        if op == "min":
            native.append(Min(f"__{name}_n", alias_name=f"__{name}_n"))
        if op == "max":
            native.append(Max(f"__{name}_x", alias_name=f"__{name}_x"))
    merged = partial.groupby(list(keys)).aggregate(*native)

    def _finalize(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return out_schema.empty_table()
        cols = {k: b[k] for k in keys}
        for name, (_col, op) in aggs.items():
            if op == "count":
                cols[name] = b[f"__{name}_c"]
            elif op == "sum":
                cols[name] = b[f"__{name}_s"]
            elif op == "min":
                cols[name] = b[f"__{name}_n"]
            elif op == "max":
                cols[name] = b[f"__{name}_x"]
            elif op == "mean":
                import pyarrow.compute as pc

                cols[name] = pc.divide(
                    pc.cast(b[f"__{name}_s"], pa.float64()),
                    pc.cast(b[f"__{name}_c"], pa.float64()),
                )
        return pa.table(cols)

    return merged.map_batches(_finalize, batch_format="pyarrow")
