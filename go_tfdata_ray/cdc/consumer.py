"""Downstream CDC consumers: incrementally-maintained materialized views.

The point of the ``changes()`` feed (engine.py) is that a consumer can roll
its own derived state forward WITHOUT rescanning the lake. This module
implements the canonical example — a grouped rollup (docs + tokens per
``source``) maintained incrementally:

    new_view = old_view + contributions(new row versions)
                        - contributions(pre-images of changed keys)

Pre-images come from ``lookup(changed_keys, at_version=old)`` — hash-routed
point reads against the OLD manifest snapshot, O(changed partitions), so a
refresh costs O(change set), not O(lake). Tombstones ('D' net rows) simply
contribute nothing on the + side while their pre-image is subtracted.

Scale notes: the net change set of one refresh interval is assumed to fit
the driver as (group, count, sum) partials — the per-key work (digesting
net rows, pre-image lookup) is distributed; only the grouped deltas are
collected. For views over high-cardinality groups, swap the final dict for
a keyed Dataset and apply deltas with a groupby — same algebra.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

import ray

from .engine import CDCEngine


class SourceRollup:
    """Materialized (source → n_docs, total_tokens) view with incremental
    refresh from the changes feed."""

    def __init__(self, engine: CDCEngine):
        self.engine = engine
        self.version: int | None = None
        self.state: dict[str, list[int]] = {}  # source -> [n_docs, total_tokens]

    @staticmethod
    def _contrib(t: pa.Table, sign: int, acc: dict[str, list[int]]) -> None:
        if t.num_rows == 0:
            return
        src = t["source"].to_pylist()
        ntok = t["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64)
        for s, n in zip(src, ntok):
            a = acc.setdefault(s, [0, 0])
            a[0] += sign
            a[1] += sign * int(n)

    def full_refresh(self) -> dict[str, Any]:
        """Initial (or fallback) build: one full merged scan."""
        self.state = {}
        for ref in self.engine.scan(columns=["source", "n_tok"]).to_arrow_refs():
            self._contrib(ray.get(ref), +1, self.state)
        self.version = self.engine.manifest.version
        return {"mode": "full", "version": self.version}

    def refresh(self) -> dict[str, Any]:
        """Roll the view forward to the engine's current version using only
        the changes feed + pre-image lookups. Falls back to full_refresh if
        compaction already folded the needed epochs (the feed's documented
        retention contract)."""
        if self.version is None:
            return self.full_refresh()
        cur = self.engine.manifest.version
        if cur == self.version:
            return {"mode": "noop", "version": cur}
        try:
            net_refs = self.engine.changes(self.version, collapsed=True).to_arrow_refs()
        except RuntimeError:  # epochs compacted away — full resync
            return self.full_refresh()
        nets = [t for t in [ray.get(r) for r in net_refs] if t.num_rows]
        changed: list[str] = []
        for t in nets:
            changed.extend(t["doc_id"].to_pylist())
        pre = self.engine.lookup(changed, columns=["doc_id", "source", "n_tok"],
                                 at_version=self.version)
        self._contrib(pre, -1, self.state)
        for t in nets:
            live = t.filter(pa.compute.not_equal(t["op"], "D"))
            self._contrib(live, +1, self.state)
        self.state = {k: v for k, v in self.state.items() if v[0] != 0}
        self.version = cur
        return {"mode": "incremental", "version": cur, "changed_keys": len(changed)}

    def table(self) -> pa.Table:
        keys = sorted(self.state)
        return pa.table(
            {
                "source": pa.array(keys, pa.string()),
                "n_docs": pa.array([self.state[k][0] for k in keys], pa.int64()),
                "total_tokens": pa.array([self.state[k][1] for k in keys], pa.int64()),
            }
        )

    # -- checkpointing -------------------------------------------------------
    # The engine resumes from its committed manifest; a consumer restarted
    # without its cursor would have to full-refresh (O(lake)). Persisting
    # (view state, engine version) makes the view resumable for O(change
    # set) instead — the same crash story as the engine, scaled down.
    # tmp+rename keeps the checkpoint atomic; a torn write is invisible.

    def save(self, path: str) -> None:
        """Atomically checkpoint the view table + its engine-version cursor."""
        import os

        import pyarrow.parquet as pq

        if self.version is None:
            raise ValueError("nothing to checkpoint: refresh first")
        t = self.table().replace_schema_metadata(
            {b"rollup_version": str(self.version).encode()}
        )
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.rename(tmp, path)

    @classmethod
    def load(cls, engine: CDCEngine, path: str) -> "SourceRollup":
        """Restore a checkpointed view; the next ``refresh()`` rolls forward
        incrementally from the checkpoint's version. If the engine has
        compacted/vacuumed past it, ``refresh()`` falls back to a full
        recompute internally and reports ``{"mode": "full"}`` — monitor
        that mode if the O(change set) guarantee matters operationally."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        view = cls(engine)
        view.version = int(t.schema.metadata[b"rollup_version"].decode())
        view.state = {
            s: [int(n), int(tok)]
            for s, n, tok in zip(t["source"].to_pylist(),
                                 t["n_docs"].to_pylist(),
                                 t["total_tokens"].to_pylist())
        }
        return view
