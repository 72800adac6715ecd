"""Direct object-store exchange primitives.

Ray Data implements ``groupby(...).map_groups(...)`` as a global
SORT-shuffle; its fixed cost (~3 s at 32 cpus regardless of data size —
measured on sf0.1 sessionize/rolling where the exchanged bytes are ~4 MB)
dominates every shard-grouped operator in this repo. But a shard-grouped
op never needs a global order: each input block can be sliced per shard
in ONE task (``num_returns=num_shards`` → every slice is a first-class
object), and each shard's finalize task fetches exactly its slices. Same
bytes moved, no sort, no control-plane barrier. This is the generic form
of the machinery proven in ``stages/joins.py:object_exchange_hash_join``
(4.2 s → ~2 s on the sf0.1 join).

The exchange is one-shot (plain tasks, no iterated Dataset plan), so it
also sidesteps the documented streaming-executor deadlock class
(see CLAUDE.md / memory `ray-streaming-executor-deadlocks`).
"""

from __future__ import annotations

from typing import Callable, Literal

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def exchange_coalesce_map(
    ds: rd.Dataset,
    fn: Callable,
    batch_format: Literal["pandas", "pyarrow"] = "pandas",
) -> rd.Dataset:
    """Replacement for ``ds.repartition(1).map_batches(fn, batch_size=None)``
    on TINY datasets (partial aggregates, per-block top-k): one task fetches
    every block ref and applies ``fn`` to the concatenation. Ray's
    Repartition is an AllToAll operator whose scheduling fixed cost
    (~0.5-1 s) dwarfs the actual combine at partial-aggregate sizes; this
    is a plain task. ONLY for finals whose input is already combiner-capped
    (k × blocks / groups × blocks rows) — never point corpus-sized data at
    a single task."""

    @ray.remote
    def combine(*blocks):
        parts = [b for b in blocks if b.num_columns and b.num_rows]
        if not parts:
            parts = [b for b in blocks if b.num_columns] or list(blocks)
        t = (
            pa.concat_tables(parts, promote_options="permissive")
            if len(parts) > 1
            else parts[0]
        )
        if batch_format == "pandas":
            return pa.Table.from_pandas(fn(t.to_pandas()), preserve_index=False)
        return fn(t)

    m = ds.materialize()
    if m.count() == 0:
        # Zero-row input: the blocks arrive as 0-COLUMN arrow (pandas
        # empties lose their schema in the block conversion), so the
        # combine task can't feed fn a typed frame. Rebuild the typed
        # empty from the Dataset-level schema and run fn on it HERE —
        # aggregate finals rely on fn emitting its identity row (e.g. a
        # 0-count histogram) even for empty input. Only a fully
        # schemaless input degrades to the plain map_batches path.
        schema = m.schema()
        base = getattr(schema, "base_schema", None)
        if isinstance(base, pa.Schema) and base.names:
            empty = base.empty_table()
        elif schema is not None and getattr(base, "names", None):
            empty = pa.Table.from_pandas(
                pd.DataFrame({n: pd.Series(dtype=t)
                              for n, t in zip(base.names, base.types)}),
                preserve_index=False,
            )
        else:
            return m.map_batches(fn, batch_format=batch_format, batch_size=None)
        if batch_format == "pandas":
            out = pa.Table.from_pandas(fn(empty.to_pandas()),
                                       preserve_index=False)
        else:
            out = fn(empty)
        return rd.from_arrow(out)
    refs = m.to_arrow_refs()
    return rd.from_arrow_refs([combine.remote(*refs)])


def exchange_group_map(
    ds: rd.Dataset,
    fn: Callable,
    num_shards: int,
    shard_col: str = "_shard",
    batch_format: Literal["pandas", "pyarrow"] = "pandas",
    max_exchange_blocks: int = 4096,
) -> rd.Dataset:
    """Drop-in replacement for ``ds.groupby(shard_col).map_groups(fn)``
    when ``shard_col`` holds ints in ``[0, num_shards)`` (the hash-shard
    pattern used by distinct / sessionize / rolling / quantiles / dedup
    finals): routes each block's rows to per-shard slices over the object
    store and runs ``fn`` once per non-empty shard on the concatenated
    slice (exactly ``map_groups`` semantics — ``fn`` sees the whole shard
    including ``shard_col``, and is never called on an empty shard).

    Scale shape: router tasks are per-input-block (embarrassingly
    parallel); each shard task fetches only its own slices, so peak
    memory per task is one shard, not the dataset. The per-shard counts
    round-trip to the driver is O(num_shards × blocks) ints — the merge
    stage is already an all-blocks barrier per shard, so this adds no
    critical-path latency. Crossover: past ``max_exchange_blocks`` input
    blocks the (B+1)-objects-per-block ref fan-out becomes object-store
    metadata pressure, so the input is REPARTITIONED down to
    ``max_exchange_blocks`` blocks first and the exchange proceeds on the
    coalesced blocks — the routing stays on the exchange path (Ray's
    groupby is used only for a fully EMPTY input, where there is nothing
    to route and the sort-shuffle's fixed cost vanishes)."""
    B = num_shards

    @ray.remote
    def route(t: pa.Table):
        if t.num_columns == 0 or t.num_rows == 0:  # empty pandas block → 0-col
            return (*[pa.table({})] * B, np.zeros(B, dtype=np.int64))
        sh = t[shard_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(sh) and (sh.min() < 0 or sh.max() >= B):
            # the searchsorted slicing below would silently DROP rows outside
            # [0, B) — turn a contract violation into a loud error instead
            raise ValueError(
                f"shard column {shard_col!r} has values outside [0, {B}): "
                f"min={sh.min()}, max={sh.max()}"
            )
        order = np.argsort(sh, kind="stable")
        t = t.take(pa.array(order))
        bounds = np.searchsorted(sh[order], np.arange(B + 1))
        counts = np.diff(bounds).astype(np.int64)
        return (
            *(t.slice(int(bounds[i]), int(counts[i])) for i in range(B)),
            counts,
        )

    @ray.remote(num_returns=2)
    def finalize(*refs):
        parts = [p for p in refs if p.num_rows]
        t = (
            pa.concat_tables(parts, promote_options="permissive")
            if len(parts) > 1
            else parts[0]
        )
        if batch_format == "pandas":
            out = pa.Table.from_pandas(fn(t.to_pandas()), preserve_index=False)
        else:
            out = fn(t)
        return out, out.num_rows

    m = ds.materialize()
    refs = m.to_arrow_refs()
    if len(refs) > max_exchange_blocks:
        # Scale crossover: the exchange creates (B+1) objects per input
        # block and each finalize takes #blocks arguments — at huge block
        # counts that is object-store metadata pressure. COALESCE the
        # blocks (streaming split/merge repartition, one extra pass —
        # comparable to what a sort-shuffle would copy anyway) and stay on
        # the exchange path, so the out-of-range validation and the
        # zero-row-output schema protection hold at every block count.
        m = m.repartition(max_exchange_blocks // 2).materialize()
        refs = m.to_arrow_refs()
    routed = [
        route.options(num_returns=B + 1).remote(r) for r in refs
    ]
    totals = np.zeros(B, dtype=np.int64)
    for c in ray.get([r[B] for r in routed]):
        totals += c
    out_refs = [
        finalize.remote(*(blk[s] for blk in routed))
        for s in range(B)
        if totals[s] > 0
    ]
    if not out_refs:
        # fully-empty input: fall back to the groupby path (cheap at 0 rows)
        # so the result still carries fn's output schema where inferable
        return m.groupby(shard_col).map_groups(fn, batch_format=batch_format)
    # drop zero-row fn outputs: a pandas fn that builds its frame from empty
    # Python lists types the columns float64, and one such block would poison
    # the whole Dataset's schema (int64 ∪ double → double after concat).
    # The n-refs round-trip is tiny and the exchange is a barrier anyway.
    n_rows = ray.get([n for _, n in out_refs])
    kept = [t for (t, _), n in zip(out_refs, n_rows) if n > 0]
    if not kept:
        kept = [out_refs[0][0]]  # all-empty: keep one block for the schema
    return rd.from_arrow_refs(kept)
