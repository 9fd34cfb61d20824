"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in fide_crawler_ray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline — synthetic-site frontier crawl →
  parsed/normalized/deduped game_history — plus a smoke aggregation over
  /root/testdata/sf0.001 to prove the testdata path.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  the training-data ops); each takes sf_dir.
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query (column names match exactly). Crawl/sketch/ANN-IVF/lang-ID
  queries are non-SQL-expressible → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: run the synthetic crawl + read sf0.001 to validate the
    testdata read path; returns the crawled game_history Dataset."""
    import ray.data as rd

    from fide_crawler_ray.pipelines import queries as Q

    # touch the testdata path (schema check) without materializing much
    rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                    columns=["l_orderkey"]).count()
    return Q.q_crawl_game_history("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from fide_crawler_ray.pipelines import queries as Q

    return Q.queries()


def oracle_sql() -> dict[str, str]:
    from fide_crawler_ray.pipelines import queries as Q

    return Q.oracle_sql()
