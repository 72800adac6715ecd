"""Relational operators beyond the reference's surface (SURVEY.md §2.6: the
reference has no joins/sorts/aggregates — a complete engine needs them).
Everything here is a vectorized batch transform or a single keyed shuffle.

- deterministic sampling (modulo on a numeric key — replayable, no RNG state)
- explode / flat_map (unnest a list column, zero-copy flatten + np.repeat)
- group-collect (the tar Record "group members by key" analog,
  `/root/reference/tfdata/archive/manager.go:57-63`, as groupby + ordered
  collect)
- per-group top-k (windowed rank, QUALIFY row_number() <= k analog)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..cdc.collapse import hash_partition
from .exchange import exchange_coalesce_map, exchange_group_map


def sum_groupby_arrow(t: pa.Table, group_cols: list[str],
                      sum_cols: list[str]) -> pa.Table:
    """Arrow-native grouped sum (``pa.TableGroupBy``) — the hot combiner
    kernel. No pandas round-trip: hash-groupby runs on the Arrow buffers
    directly; output column order is ``group_cols + sum_cols`` with the
    original names (Arrow's ``_sum`` suffixes stripped)."""
    g = pa.TableGroupBy(t.select(list(group_cols) + list(sum_cols)),
                        list(group_cols))
    out = g.aggregate([(c, "sum") for c in sum_cols])
    cols = {k: out[k] for k in group_cols}
    for c in sum_cols:
        cols[c] = out[f"{c}_sum"]
    return pa.table(cols)


def group_key_hash(t: pa.Table, group_cols: list[str]) -> np.ndarray:
    """Deterministic uint64 hash of the group-key tuple, vectorized per
    column (splitmix-style mix for numerics, ``pd.util.hash_array`` for
    strings) and FNV-combined across columns. Null-free keys assumed (the
    combiner partials never emit null group keys)."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in group_cols:
        col = t[c].combine_chunks()
        if pa.types.is_integer(col.type):
            v = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
            hc = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            hc ^= hc >> np.uint64(29)
            hc *= np.uint64(0xBF58476D1CE4E5B9)
            hc ^= hc >> np.uint64(32)
        else:
            hc = pd.util.hash_array(
                np.asarray(col.to_pylist(), dtype=object), categorize=False)
        h = h * np.uint64(1099511628211) ^ hc
    return h


def combine_partials(
    partials: rd.Dataset,
    group_cols: list[str],
    sum_cols: list[str],
    fanout: int = 0,
) -> rd.Dataset:
    """Final combine for pre-aggregated (combiner) partials — Arrow-native
    end to end (``pa.TableGroupBy``; no pandas conversion in the combine).

    Partial aggregates are tiny — ≤ groups × blocks rows — so Ray's
    all-to-all Aggregate operator (sort shuffle, ~seconds of fixed cost even
    for 100 rows) is the wrong tool. Default: a coalesce + one combine task
    (the tree-reduce final node). Pass ``fanout`` > 0 when group
    cardinality × blocks is large (e.g. per-user windows over many
    blocks): partials are then hash-sharded BY GROUP KEY over the object
    exchange and combined once per shard — each group lands wholly in one
    shard, so the per-shard combine is already the final (distributed)
    result, with no all-to-all and no single-task bottleneck."""

    def comb(t: pa.Table) -> pa.Table:
        return sum_groupby_arrow(t, group_cols, sum_cols)

    if fanout:
        def add_shard(t: pa.Table) -> pa.Table:
            sh = (group_key_hash(t, group_cols) % np.uint64(fanout)).astype(np.int64)
            return t.append_column("_shard", pa.array(sh))

        def comb_shard(t: pa.Table) -> pa.Table:
            return comb(t.drop_columns(["_shard"]))

        return exchange_group_map(
            partials.map_batches(add_shard, batch_format="pyarrow",
                                 zero_copy_batch=True),
            comb_shard, fanout, batch_format="pyarrow",
        )
    return exchange_coalesce_map(partials, comb, batch_format="pyarrow")


def distinct(ds: rd.Dataset, cols: list[str] | None = None,
             num_shards: int = 64) -> rd.Dataset:
    """Distributed DISTINCT: per-batch dedup (the combiner) then ONE groupby
    over hash shards of the row content — output cardinality is unbounded,
    so there is never a single-task final holding every distinct row."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if cols:
            df = df[cols]
        df = df.drop_duplicates()
        sh = (pd.util.hash_pandas_object(df, index=False).to_numpy()
              % np.uint64(num_shards)).astype(np.int64)
        df = df.copy()
        df["_shard"] = sh
        return df

    def final_shard(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=["_shard"]).drop_duplicates()

    return exchange_group_map(
        ds.map_batches(partial, batch_format="pandas"), final_shard, num_shards
    )


def sample_mod(ds: rd.Dataset, col: str, m: int, r: int = 0) -> rd.Dataset:
    """Deterministic 1/m sample: keep rows where ``col % m == r``.

    Replayable under retries and identical across runs (unlike RNG-seeded
    per-task sampling, whose output depends on block layout). For key-hashed
    sampling of string keys, hash first and sample the hash.
    """

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(v % m == r))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def explode_list(
    ds: rd.Dataset, list_col: str, value_name: str = "value",
    keep_cols: list[str] | None = None, value_type: pa.DataType | None = None,
) -> rd.Dataset:
    """flat_map / unnest: one output row per list element. Vectorized —
    the list column is flattened zero-copy; kept columns are np.repeat'ed by
    per-row list length. Null lists explode to zero rows."""

    def f(t: pa.Table) -> pa.Table:
        col = t[list_col].combine_chunks()
        flat = col.flatten()
        offs = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in keep_cols or [n for n in t.column_names if n != list_col]:
            idx = np.repeat(np.arange(len(t)), lens)
            cols[c] = t[c].take(pa.array(idx))
        cols[value_name] = flat if value_type is None else pc.cast(flat, value_type)
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def collect_group_csv(
    ds: rd.Dataset, group_col: str, value_col: str, out_col: str = "values_csv",
    sep: str = ",", num_shards: int = 64,
) -> rd.Dataset:
    """Group-members-by-key collect (the reference's tar Record grouping,
    `manager.go:57-63`), emitted as an order-canonical CSV string per group
    so results are schema-stable and hashable.

    Per-batch partial collect (the combiner) then ONE groupby shuffle over
    hash SHARDS of the group key — the final merge is distributed across
    ``num_shards`` tasks (collected values are the full group content; a
    single-task final would materialize O(input) in one worker at scale)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)[value_col].agg(list).reset_index()
        g = g.rename(columns={value_col: "_vals"})
        g["_shard"] = hash_partition(
            pa.array(g[group_col].to_numpy()), num_shards
        ).astype(np.int64)
        return g

    def final_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)["_vals"].agg(
            lambda ls: sorted(x for sub in ls for x in sub)
        ).reset_index()
        g[out_col] = g["_vals"].map(lambda v: sep.join(map(str, v)))
        return g[[group_col, out_col]]

    partials = ds.map_batches(partial, batch_format="pandas")
    return exchange_group_map(partials, final_shard, num_shards)


def assign_split(
    ds: rd.Dataset, col: str, fracs: dict[str, int] | None = None, modulus: int = 10,
    out_col: str = "split",
) -> rd.Dataset:
    """Deterministic train/val/test assignment by key modulo (replayable,
    layout-independent — per-task RNG sampling would reshuffle on every
    repartition). ``fracs`` maps split name → bucket count out of
    ``modulus`` (default 8/1/1)."""
    fracs = fracs or {"train": 8, "val": 1, "test": 1}
    assert sum(fracs.values()) == modulus
    bounds, names, acc = [], [], 0
    for name, cnt in fracs.items():
        acc += cnt
        bounds.append(acc)
        names.append(name)

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64) % modulus
        lab = np.empty(len(v), dtype=object)
        lo = 0
        for name, hi in zip(names, bounds):
            lab[(v >= lo) & (v < hi)] = name
            lo = hi
        return t.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def sessionize(
    ds: rd.Dataset, user_col: str, ts_col: str, gap_s: int = 1800,
    order_tiebreak: str | None = None, num_shards: int = 64,
) -> rd.Dataset:
    """Session windows: per user, a new session starts when the gap since
    the previous event exceeds ``gap_s``. Returns
    (user_col, session_id, n_events).

    ONE keyed shuffle — but grouped by hash SHARD of the user, not by user:
    one vectorized call per shard (user/session boundaries via sorted diff)
    instead of one Ray ``map_groups`` call per user, whose per-group
    overhead × 10⁸ users would dominate at scale (same shard-resolve
    pattern as ``functions/dedup.py`` resolve_shard)."""

    def add_shard(t: pa.Table) -> pa.Table:
        sh = hash_partition(t[user_col], num_shards).astype(np.int64)
        return t.append_column("_shard", pa.array(sh))

    def sess_shard(g: pd.DataFrame) -> pd.DataFrame:
        by = [user_col, ts_col] + ([order_tiebreak] if order_tiebreak else [])
        g = g.sort_values(by, kind="mergesort")
        users = g[user_col].to_numpy()
        n = len(users)
        if n == 0:
            return pd.DataFrame({user_col: users, "session_id": [], "n_events": []})
        new_user = np.r_[True, users[1:] != users[:-1]]
        ts = g[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)  # unit-safe
        new = new_user | np.r_[True, np.diff(ts) > gap_s]
        cum = np.cumsum(new)
        user_idx = np.cumsum(new_user) - 1
        base = cum[np.flatnonzero(new_user)]  # cum value at each user's first row
        sid = cum - base[user_idx] + 1  # restarts at 1 per user
        starts = np.flatnonzero(new)
        n_events = np.diff(np.r_[starts, n])
        return pd.DataFrame(
            {
                user_col: users[starts],
                "session_id": sid[starts].astype("int64"),
                "n_events": n_events.astype("int64"),
            }
        )

    sharded = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_group_map(sharded, sess_shard, num_shards)


def rollup(
    ds: rd.Dataset, group_cols: list[str], sum_cols: list[str],
) -> rd.Dataset:
    """GROUP BY ROLLUP(group_cols): aggregates at every prefix level —
    (a, b), (a), and grand total — with NULLs in the rolled-up columns.

    Only the FINEST level aggregates over the input (per-batch combiner →
    tiny combine); every coarser level re-aggregates the finest RESULT
    (≤ distinct(group_cols) rows), so the input is read once and nothing
    wide shuffles twice."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, sort=False, as_index=False)[sum_cols].sum()

    finest = combine_partials(
        ds.map_batches(partial, batch_format="pandas"), group_cols, sum_cols
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        levels = [df]
        for i in range(len(group_cols) - 1, -1, -1):
            keep = group_cols[:i]
            if keep:
                lv = df.groupby(keep, sort=False, as_index=False)[sum_cols].sum()
            else:
                lv = df[sum_cols].sum().to_frame().T
            for c in group_cols[i:]:
                lv[c] = None
            levels.append(lv[group_cols + sum_cols])
        return pd.concat(levels, ignore_index=True)

    return finest.map_batches(expand, batch_format="pandas", batch_size=None)


def rolling_per_key(
    ds: rd.Dataset, key_col: str, order_cols: list[str], value_col: str,
    out_col: str = "running", num_shards: int = 64,
) -> rd.Dataset:
    """Per-key running sum (SQL ``SUM(v) OVER (PARTITION BY key ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING)``). ONE keyed shuffle, grouped by
    hash SHARD of the key (not per key — same rationale as ``sessionize``):
    per shard, one mergesort + one cumsum with per-key base subtraction.
    Use an integer value column (e.g. cents) for bit-exact results — float
    accumulation order would otherwise differ between engines."""

    def add_shard(t: pa.Table) -> pa.Table:
        sh = hash_partition(t[key_col], num_shards).astype(np.int64)
        return t.append_column("_shard", pa.array(sh))

    def roll_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, *order_cols], kind="mergesort").drop(columns=["_shard"])
        if not len(g):
            return g.assign(**{out_col: np.array([], dtype=np.int64)})
        keys = g[key_col].to_numpy()
        v = g[value_col].to_numpy().astype(np.int64)
        cs = np.cumsum(v)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        base = (cs - v)[np.flatnonzero(new_key)]  # prefix sum before each key's first row
        key_idx = np.cumsum(new_key) - 1
        return g.assign(**{out_col: cs - base[key_idx]})

    sharded = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_group_map(sharded, roll_shard, num_shards)


def quantiles_per_group(
    ds: rd.Dataset, group_col: str, value_col: str, qs: dict[str, float],
    num_shards: int = 16,
) -> rd.Dataset:
    """Exact per-group discrete quantiles (DuckDB ``quantile_disc``
    semantics: 0-based index ``ceil(q*n) - 1`` of the sorted values).
    Shuffles only the (group, value) pair columns — prune the read to
    those two; exactness requires each group's full value multiset on one
    task, the inherent cost of exact quantiles. ``qs``: out-column → q.
    At larger-than-memory group sizes switch to the two-pass histogram
    sketch (``functions/sketch.py:approx_quantiles_per_group`` — shuffle
    volume O(groups × bins), error ≤ one bin width); this operator is the
    exact path."""

    def add_shard(t: pa.Table) -> pa.Table:
        sh = hash_partition(t[group_col], num_shards).astype(np.int64)
        return t.select([group_col, value_col]).append_column("_shard", pa.array(sh))

    def quant_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, value_col], kind="mergesort")
        keys = g[group_col].to_numpy()
        vals = g[value_col].to_numpy()
        if not len(g):
            return pd.DataFrame({group_col: keys, **{c: vals for c in qs}})
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        starts = np.flatnonzero(new_key)
        counts = np.diff(np.r_[starts, len(keys)])
        out = {group_col: keys[starts]}
        for name, q in qs.items():
            # clamp the per-group offset to >= 0: q=0.0 gives ceil(0)-1 = -1,
            # which would index the PREVIOUS group's last value (or wrap)
            off = np.maximum(np.ceil(q * counts).astype(np.int64) - 1, 0)
            out[name] = vals[starts + off]
        return pd.DataFrame(out)

    sharded = ds.map_batches(add_shard, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_group_map(sharded, quant_shard, num_shards)


def topk_global(
    ds: rd.Dataset, order_col: str, k: int,
    descending: bool = True, tie_col: str | None = None,
) -> rd.Dataset:
    """Global top-k WITHOUT a global sort: per-batch partial top-k (the
    combiner — caps what moves at k × blocks rows) then one tiny final.
    ``ds.sort().limit(k)`` moves every row through an all-to-all sort
    exchange to keep k of them; this moves k rows per block. Rows come
    back order-canonical (sorted by the rank key)."""
    keys = [(order_col, "descending" if descending else "ascending")]
    if tie_col:
        keys.append((tie_col, "ascending"))

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native partial top-k: select_k is a partial sort (heap
        # select), returns the k rows already rank-ordered — no pandas
        return t.take(pc.select_k_unstable(t, k=k, sort_keys=keys))

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    return exchange_coalesce_map(partials, partial, batch_format="pyarrow")


def topk_per_group(
    ds: rd.Dataset, group_col: str, order_col: str, k: int,
    descending: bool = True, tie_col: str | None = None,
) -> rd.Dataset:
    """Windowed rank: top-k rows per group (QUALIFY row_number() <= k).
    Per-batch partial top-k (the combiner — caps shuffle volume at
    k × groups × blocks) before the groupby finalize."""
    keys = [(group_col, "ascending"),
            (order_col, "descending" if descending else "ascending")]
    if tie_col:
        keys.append((tie_col, "ascending"))

    def head_k(t: pa.Table) -> pa.Table:
        # Arrow-native windowed head-k: one sort puts groups contiguous in
        # rank order; the per-group rank is pure numpy over the sorted key
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        g = t[group_col].to_numpy(zero_copy_only=False)
        new = np.r_[True, g[1:] != g[:-1]]
        first = np.flatnonzero(new)
        rank = np.arange(len(g)) - first[np.cumsum(new) - 1]
        return t.filter(pa.array(rank < k))

    # partials are ≤ k × groups × blocks rows — single-task final combine
    partials = ds.map_batches(head_k, batch_format="pyarrow",
                              zero_copy_batch=True)
    return exchange_coalesce_map(partials, head_k, batch_format="pyarrow")
