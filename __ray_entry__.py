"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``     — flagship CDC replay pipeline on /root/testdata/sf0.001.
- ``queries()``   — one callable per implemented operator/pipeline
  (SURVEY.md §2 + training-data ops); each takes ``sf_dir``.
- ``oracle_sql()``— DuckDB-equivalent SQL per query (omitted for the
  genuinely non-SQL-expressible ops → driver does a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from go_tfdata_ray.pipelines import queries as Q
from go_tfdata_ray.sources import wal as walmod


def entry() -> Any:
    """Flagship: generate the deterministic sf0.001 WAL, replay it through
    the CDC engine (exactly-once, manifest-committed), return the merged
    lake snapshot as a streaming Dataset."""
    eng = Q.replayed_engine("/root/testdata/sf0.001")
    return eng.scan()


def queries() -> dict[str, Callable[[str], Any]]:
    # Pre-generate the sf0.01 WAL so the CDC oracle SQL (which reads it from
    # its fixed /tmp path) works regardless of run order.
    try:
        walmod.ensure_wal_for_sf("/root/testdata/sf0.01")
    except Exception:
        pass  # queries that need it will regenerate on call
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE_SQL)
