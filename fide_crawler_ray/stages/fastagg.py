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

import os

# Hash-shuffle partition count for Dataset.join / groupby exchanges.
# Sized to the CLUSTER, not the core count: each partition costs one
# aggregator actor plus one in-flight object per (block, partition), so
# on this 32-CPU single node 32 partitions ran a small-SF join in 53 s
# where 8 took ~2 s (BASELINE.md, r2). A real deployment sets
# FCRAY_JOIN_PARTS to a small multiple of the node count; every join
# call site in the engine routes through this one knob. Defined here
# (the lowest shared module) so pipelines can import it without cycles.
JOIN_PARTS = int(os.environ.get("FCRAY_JOIN_PARTS", "8"))

import pandas as pd
import pyarrow as pa

# Above this many partial rows, the single-task combine becomes the
# bottleneck (and eventually an OOM): switch to the native hash
# aggregate over the partials. 4M rows × ~50 B ≈ 200 MB — comfortably
# one task below the threshold, clearly shuffle territory above it.
DEFAULT_MAX_COMBINE_ROWS = 4_000_000


def live_arrow(tables) -> list[pa.Table]:
    """Coerce block refs to non-empty Arrow tables.

    Blocks arriving via ``to_arrow_refs`` are normally Arrow, but Ray's
    map operators pass ZERO-ROW input blocks through without running the
    UDF, so a pandas empty block minted upstream — e.g. an empty
    ``map_groups`` sort partition, which materializes as a zero-column
    ``pd.DataFrame()`` — can reach a combine task untouched and crash
    ``t.num_rows``. Empties carry no aggregate state, so dropping them
    (after coercing any stray pandas survivors) is exact."""
    out = []
    for t in tables:
        if isinstance(t, pd.DataFrame):
            if len(t) == 0:
                continue
            t = pa.Table.from_pandas(t, preserve_index=False) \
                .replace_schema_metadata(None)
        if t.num_rows > 0 and t.num_columns > 0:
            out.append(t)
    return out


def _dummy_row(schema: pa.Schema) -> pa.Table:
    """One type-appropriate default row for `schema` — used to run the
    pandas partial path on EMPTY batches without dtype degradation
    (pandas aggregates over an empty frame demote dtypes, which makes
    empty partial blocks schema-mismatch the non-empty ones)."""
    cols = {}
    for f in schema:
        if pa.types.is_timestamp(f.type):
            v = pa.array([0], pa.int64()).cast(f.type)
        elif pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            v = pa.array([""], f.type)
        elif pa.types.is_binary(f.type) or pa.types.is_fixed_size_binary(f.type):
            v = pa.array([b"\x00" * getattr(f.type, "byte_width", 1)], f.type)
        else:
            v = pa.array([0], pa.int64()).cast(f.type)
        cols[f.name] = v
    return pa.table(cols)


def _arrow_groupby_ok(b: pa.Table, keys, specs) -> bool:
    """True when ``pa.Table.group_by`` reproduces the pandas partial
    EXACTLY for this batch — same values AND same output dtypes:

    - keys: int/uint/bool/string, no nulls (null keys round-trip through
      pandas as float64/NaN and take the restore path; timestamps change
      unit under to_pandas);
    - sum/mean inputs: int64/uint64 only, no nulls (pandas promotes
      int-with-null to float64, sums all-null groups to 0.0 where arrow
      yields null, and float sums differ in association order — the
      1-ULP class r1 taught us to respect);
    - min/max inputs: any int/float/string, no nulls (exact, order-free).

    The check is metadata-only (``null_count``), so it costs nothing per
    batch; ineligible batches fall back to the original pandas path,
    whose output dtypes these rules are designed to match."""
    for k in keys:
        if k not in b.schema.names:
            return False
        t = b.schema.field(k).type
        if not (pa.types.is_integer(t) or pa.types.is_boolean(t)
                or pa.types.is_string(t) or pa.types.is_large_string(t)):
            return False
        if b[k].null_count:
            return False
    for col, op in specs:
        if op == "count":
            continue
        if col not in b.schema.names or b[col].null_count:
            return False
        t = b.schema.field(col).type
        if op in ("sum", "mean", "mean_count"):
            if not (pa.types.is_int64(t) or pa.types.is_uint64(t)):
                return False
        elif op in ("min", "max"):
            # large_string is deliberately NOT eligible here: the pandas
            # fallback re-emits min/max VALUE columns via from_pandas as
            # plain string (keys are restored to the input type below,
            # values are not), so a mixed arrow/pandas block pair would
            # concat with mismatched schemas (r5 advice fix)
            if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                    or pa.types.is_string(t)):
                return False
        else:
            return False
    return True


def _arrow_groupby(b: pa.Table, keys, out_specs) -> pa.Table:
    """``out_specs``: [(out_name, in_col_or_None, arrow_fn)] with
    arrow_fn ∈ {count_all, count, sum, min, max}. Returns keys-first
    columns in out_specs order (matching the pandas paths). Output
    columns are selected by POSITION (group_by emits keys then
    aggregates in request order), so pathological column names cannot
    alias."""
    want: dict[tuple, int] = {}
    agg_list = []
    for _, col, fn in out_specs:
        spec = (col, fn)
        if spec not in want:
            want[spec] = len(agg_list)
            agg_list.append((col if col is not None else [], fn))
    r = b.group_by(list(keys), use_threads=False).aggregate(agg_list)
    assert r.column_names[: len(keys)] == list(keys)
    cols = {k: r.column(i) for i, k in enumerate(keys)}
    for out, col, fn in out_specs:
        cols[out] = r.column(len(keys) + want[(col, fn)])
    return pa.table(cols)


def fast_groupby_agg(ds, keys: list[str], aggs: dict[str, tuple[str | None, str]],
                     max_combine_rows: int = DEFAULT_MAX_COMBINE_ROWS):
    """aggs: {out_col: (in_col_or_None, 'count'|'sum'|'min'|'max'|'mean')}."""

    def _partial(b: pa.Table) -> pa.Table:
        # Arrow-native fast path (r4): zero-copy group_by, no
        # pandas conversion/allocation churn per batch. Guarded by
        # _arrow_groupby_ok so values and dtypes are identical to the
        # pandas fallback below (pinned by tests/test_fastagg_fallback).
        if _arrow_groupby_ok(b, keys, list(aggs.values())):
            specs = []
            for name, (col, op) in aggs.items():
                if op == "count":
                    specs.append((f"__{name}_c", None, "count_all"))
                elif op == "sum":
                    specs.append((f"__{name}_s", col, "sum"))
                elif op == "min":
                    specs.append((f"__{name}_n", col, "min"))
                elif op == "max":
                    specs.append((f"__{name}_x", col, "max"))
                elif op == "mean":
                    specs.append((f"__{name}_s", col, "sum"))
                    specs.append((f"__{name}_c", col, "count"))
            try:
                return _arrow_groupby(b, keys, specs)
            except AssertionError:
                pass  # group_by column order changed (pyarrow upgrade):
                # fall through to the pandas path, same output
        empty = b.num_rows == 0
        if empty:  # typed dummy row keeps the partial schema stable
            b = _dummy_row(b.schema)
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
        t = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        # a block whose key column is ALL null round-trips through
        # pandas as float64 (NaN group key) and would diverge from the
        # other blocks' schema at concat — restore the input key types
        for k in keys:
            if (k in b.schema.names
                    and t.schema.field(k).type != b.schema.field(k).type):
                vals = out[k].astype(object).where(pd.notna(out[k]), None)
                t = t.set_column(
                    t.schema.get_field_index(k), k,
                    pa.array(vals.tolist(), type=b.schema.field(k).type))
        return t.slice(0, 0) if empty else t

    partial = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    if partial.count() <= max_combine_rows:
        import ray
        import ray.data as rd

        # explicit Ray task, NOT repartition(1)+map_batches: Ray splits
        # output blocks over target_max_block_size, so a large partial
        # table would silently combine per-block and emit DUPLICATE keys;
        # a task receiving every block ref sees everything by construction
        ref = _final_combine_task.remote(list(keys), aggs,
                                         *partial.to_arrow_refs())
        return rd.from_arrow_refs([ref])
    return _native_combine(partial, keys, aggs)


def _final_combine(b: pa.Table, keys, aggs) -> pa.Table:
    # Arrow-native fast path mirroring _partial's (r4): merge partial
    # columns with group_by; 'mean' divides its two int64 partials in
    # float64 (same IEEE division the pandas path performs).
    specs = []
    for name, (col, op) in aggs.items():
        if op == "count":
            specs.append((f"__{name}_c", "sum"))
        elif op == "sum":
            specs.append((f"__{name}_s", "sum"))
        elif op == "min":
            specs.append((f"__{name}_n", "min"))
        elif op == "max":
            specs.append((f"__{name}_x", "max"))
        elif op == "mean":
            specs.append((f"__{name}_s", "sum"))
            specs.append((f"__{name}_c", "sum"))
    if _arrow_groupby_ok(b, keys, [(c, "min" if fn == "min" else
                                    "max" if fn == "max" else "sum")
                                   for c, fn in specs]):
        import pyarrow.compute as _pc

        try:
            r = _arrow_groupby(
                b, keys, [(c, c, fn) for c, fn in specs])
        except AssertionError:
            r = None  # pyarrow column-order change: pandas fallback
    else:
        r = None
    if r is not None:
        cols = {k: r[k] for k in keys}
        for name, (col, op) in aggs.items():
            if op == "count":
                cols[name] = r[f"__{name}_c"]
            elif op == "sum":
                cols[name] = r[f"__{name}_s"]
            elif op == "min":
                cols[name] = r[f"__{name}_n"]
            elif op == "max":
                cols[name] = r[f"__{name}_x"]
            elif op == "mean":
                cols[name] = _pc.divide(
                    r[f"__{name}_s"].cast(pa.float64()),
                    r[f"__{name}_c"].cast(pa.float64()))
        return pa.table(cols)
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
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def _lazy_final_combine_task():
    import ray

    @ray.remote
    def _t(keys, aggs, *tables: pa.Table) -> pa.Table:
        # drop empty blocks: Ray's map_batches never calls the partial fn
        # on them, so they arrive zero-column and would fail the concat
        live = live_arrow(tables)
        if not live:
            return pa.table({})
        return _final_combine(pa.concat_tables(live), keys, aggs)

    return _t


class _TaskHandle:
    """Defers the @ray.remote declaration so importing this module never
    touches Ray (library code must not initialize a session)."""

    def __init__(self, factory):
        self._factory = factory
        self._fn = None

    def remote(self, *args, **kw):
        if self._fn is None:
            self._fn = self._factory()
        return self._fn.remote(*args, **kw)


_final_combine_task = _TaskHandle(_lazy_final_combine_task)


def grouped_first_last(ds, keys: list[str], value_col: str,
                       order_cols: list[str],
                       max_combine_rows: int = DEFAULT_MAX_COMBINE_ROWS):
    """Per-key first/last `value_col` by lexicographic `order_cols` —
    fully mergeable, no per-group Python (the r1 version was a
    ``map_groups`` per key: one Python call per user, unusable at 10^7
    keys). Partial per batch: sort + vectorized groupby first/last,
    carrying the order-key values of the chosen rows; combine: the same
    operation over partials (associative), applied as a TREE when the
    partial table exceeds one task. Returns a Dataset with columns
    keys + first_value + last_value."""

    def _partial(b: pa.Table) -> pa.Table:
        empty = b.num_rows == 0
        if empty:  # typed dummy row keeps the partial schema stable
            b = _dummy_row(b.schema)
        df = b.to_pandas().sort_values(order_cols, kind="mergesort")
        g = df.groupby(list(keys), sort=False, dropna=False)
        f = g[[value_col] + list(order_cols)].first()
        l = g[[value_col] + list(order_cols)].last()
        out = f.join(l, lsuffix="__f", rsuffix="__l").reset_index()
        t = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        return t.slice(0, 0) if empty else t

    def _combine(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return _fl_combine(b, list(keys), value_col, list(order_cols))

    part = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    # tree combine: per-BLOCK merging is associative, so intermediate
    # rounds may combine any subset of partials; only the FINAL combine
    # must see everything — hence an explicit Ray task (a repartition(1)
    # map can silently split past target_max_block_size)
    while part.count() > max_combine_rows:
        nb = max(1, part.num_blocks() // 4)
        part = part.repartition(nb).map_batches(
            _combine, batch_format="pyarrow", batch_size=None
        ).materialize()
        if nb == 1:
            break
    import ray.data as rd

    final = rd.from_arrow_refs([_fl_combine_task.remote(
        list(keys), value_col, list(order_cols), *part.to_arrow_refs()
    )])
    return final.map_batches(
        lambda b: pa.table(
            {**{k: b[k] for k in keys},
             "first_value": b[f"{value_col}__f"],
             "last_value": b[f"{value_col}__l"]}
        ),
        batch_format="pyarrow",
    )


def grouped_topk(ds, keys: list[str], order_by: list[str],
                 ascending: list[bool], k: int,
                 max_combine_rows: int = DEFAULT_MAX_COMBINE_ROWS):
    """Per-key top-k rows by `order_by` — mergeable (top-k of a union ==
    top-k of per-part top-ks), so partials are vectorized
    sort+groupby.head(k) per batch, tree-combined, with the final
    combine as one explicit Ray task that also assigns 1-based ranks.
    No per-group Python (the r1 version was map_groups per group)."""

    def _sel(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(order_by, ascending=ascending, kind="mergesort")
                  .groupby(list(keys), sort=False, dropna=False).head(k))

    def _partial(b: pa.Table) -> pa.Table:
        empty = b.num_rows == 0
        if empty:
            b = _dummy_row(b.schema)
        out = _sel(b.to_pandas())
        t = pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)
        return t.slice(0, 0) if empty else t

    part = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    while part.count() > max_combine_rows:
        nb = max(1, part.num_blocks() // 4)
        part = part.repartition(nb).map_batches(
            lambda b: b if b.num_rows == 0 else pa.Table.from_pandas(
                _sel(b.to_pandas()), preserve_index=False
            ).replace_schema_metadata(None),
            batch_format="pyarrow", batch_size=None,
        ).materialize()
        if nb == 1:
            break
    import ray.data as rd

    ref = _topk_combine_task.remote(list(keys), list(order_by),
                                    list(ascending), k,
                                    *part.to_arrow_refs())
    return rd.from_arrow_refs([ref])


def _topk_combine(b: pa.Table, keys, order_by, ascending, k) -> pa.Table:
    df = (b.to_pandas()
          .sort_values(order_by, ascending=ascending, kind="mergesort")
          .groupby(list(keys), sort=False, dropna=False).head(k))
    df = df.sort_values(order_by, ascending=ascending, kind="mergesort")
    df["rank"] = df.groupby(list(keys), sort=False, dropna=False).cumcount() + 1
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _lazy_topk_combine_task():
    import ray

    @ray.remote
    def _t(keys, order_by, ascending, k, *tables: pa.Table) -> pa.Table:
        live = live_arrow(tables)
        if not live:
            return pa.table({})
        return _topk_combine(pa.concat_tables(live), keys, order_by,
                             ascending, k)

    return _t


def _fl_combine(b: pa.Table, keys, value_col, order_cols) -> pa.Table:
    fo = [f"{c}__f" for c in order_cols]
    lo = [f"{c}__l" for c in order_cols]
    df = b.to_pandas()
    first_cols = [f"{value_col}__f"] + fo
    last_cols = [f"{value_col}__l"] + lo
    f = (df.sort_values(fo, kind="mergesort")
           .groupby(list(keys), sort=False, dropna=False)[first_cols].first())
    l = (df.sort_values(lo, kind="mergesort")
           .groupby(list(keys), sort=False, dropna=False)[last_cols].last())
    out = f.join(l).reset_index()
    return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


def _lazy_fl_combine_task():
    import ray

    @ray.remote
    def _t(keys, value_col, order_cols, *tables: pa.Table) -> pa.Table:
        live = live_arrow(tables)  # see _final task note
        if not live:
            return pa.table({})
        return _fl_combine(pa.concat_tables(live), keys, value_col, order_cols)

    return _t


_fl_combine_task = _TaskHandle(_lazy_fl_combine_task)
_topk_combine_task = _TaskHandle(_lazy_topk_combine_task)


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
