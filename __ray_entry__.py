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

import os
import sys
from collections.abc import Callable
from typing import Any

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from go_tfdata_ray.pipelines import queries as Q
from go_tfdata_ray.sources import wal as walmod


def _workers_can_import() -> bool:
    """Ray workers inherit PYTHONPATH / the raylet cwd — not the driver's
    late sys.path edits. If neither carries the repo, worker-side
    ``import go_tfdata_ray`` would fail on every UDF."""
    on_pp = _REPO in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    return on_pp or os.path.realpath(os.getcwd()) == os.path.realpath(_REPO)


if not _workers_can_import():
    # driver imported us from elsewhere: ship our functions BY VALUE so
    # workers never need the module on their path
    try:
        from ray import cloudpickle as _cp

        for _name, _mod in list(sys.modules.items()):
            if _name == "go_tfdata_ray" or _name.startswith("go_tfdata_ray."):
                _cp.register_pickle_by_value(_mod)
    except Exception:
        pass


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
