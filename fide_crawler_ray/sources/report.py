"""Generic report-table sink (S7): publish a small aggregate result as
CSV and/or Markdown.

The reference publishes its final per-tournament table to a Google Sheet
(old_scripts/fide-games-scraper-public.py:173-184 — clear + write the
whole frame). The SaaS transport is out of scope (external service); the
engine keeps the semantic — "replace the report with the current
aggregate, atomically" — as local artifacts: write to a temp file, then
rename over the target, mirroring the store's atomic-epoch contract
(sources/store.py).

This is a REPORT sink, not a data sink: inputs are post-aggregate
results (hundreds to thousands of rows). Anything corpus-sized belongs
in the partitioned-parquet store, and ``write_report`` enforces that
with a row cap rather than silently serializing a dataset to the driver.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd

MAX_REPORT_ROWS = 100_000


def _to_frame(result, max_rows: int) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        n = result.count()
        if n > max_rows:
            raise ValueError(
                f"report input has {n} rows (> {max_rows}); reports are for "
                "aggregates — write bulk data with the parquet store instead"
            )
        return result.to_pandas()
    if isinstance(result, pa.Table):
        result = result.to_pandas()
    if len(result) > max_rows:
        raise ValueError(f"report input has {len(result)} rows (> {max_rows})")
    return result


def _atomic_write(path: str, text: str) -> None:
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".report_tmp_")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(text)
        os.replace(tmp, path)  # atomic on POSIX: readers see old or new
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def to_markdown(df: pd.DataFrame, float_fmt: str = "{:.4f}") -> str:
    """Markdown table without external deps (pandas' to_markdown needs
    tabulate, absent here)."""
    def fmt(v):
        if isinstance(v, float):
            return float_fmt.format(v)
        return "" if v is None else str(v)

    cols = [str(c) for c in df.columns]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(fmt(v) for v in row) + " |")
    return "\n".join(lines) + "\n"


class ReportSession:
    """ST5: session language state — the engine analog of the
    reference's ``st.session_state['lang']`` toggle (reference
    ui/streamlit_ui.py:398–414, default 'pt', flag buttons flip it; every
    subsequent render consults the session). Here the session object
    holds the language across report writes and localizes column
    headers through functions/localization.py (M19) at render time —
    presentation state only, never shipped into the data plane."""

    _TOGGLE = {"pt-BR": "en-US", "en-US": "pt-BR"}

    def __init__(self, lang: str = "pt-BR"):
        self.lang = lang

    def toggle(self) -> str:
        self.lang = self._TOGGLE.get(self.lang, "pt-BR")
        return self.lang

    def write(self, result, out_path: str,
              formats: tuple[str, ...] = ("csv", "md"),
              max_rows: int = MAX_REPORT_ROWS) -> dict[str, str]:
        return write_report(result, out_path, formats=formats,
                            max_rows=max_rows, lang=self.lang)


def write_report(result, out_path: str, formats: tuple[str, ...] = ("csv", "md"),
                 max_rows: int = MAX_REPORT_ROWS,
                 lang: str | None = None) -> dict[str, str]:
    """Write `result` (Dataset | pyarrow.Table | DataFrame) as
    `<out_path>.csv` / `<out_path>.md`, atomically replacing previous
    versions (the reference's clear+set semantic). When ``lang`` is
    given, column headers are localized through the M19 lookup before
    rendering (ST5 session-language semantics — data values are never
    translated, only display labels). Returns {format: path}."""
    df = _to_frame(result, max_rows)
    if lang is not None:
        from ..functions.localization import localize_columns

        df = localize_columns(df, lang)
    written = {}
    if "csv" in formats:
        p = f"{out_path}.csv"
        _atomic_write(p, df.to_csv(index=False))
        written["csv"] = p
    if "md" in formats:
        p = f"{out_path}.md"
        _atomic_write(p, to_markdown(df))
        written["md"] = p
    return written
