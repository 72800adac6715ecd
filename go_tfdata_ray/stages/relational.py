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


def combine_partials(
    partials: rd.Dataset,
    group_cols: list[str],
    sum_cols: list[str],
    fanout: int = 0,
) -> rd.Dataset:
    """Final combine for pre-aggregated (combiner) partials.

    Partial aggregates are tiny — ≤ groups × blocks rows — so Ray's
    all-to-all Aggregate operator (sort shuffle, ~seconds of fixed cost even
    for 100 rows) is the wrong tool. A coalesce + one combine task is the
    tree-reduce final node; pass ``fanout`` > 0 to add an intermediate
    combine level when group cardinality × blocks is large (e.g. per-user
    windows over many blocks)."""

    def comb(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_cols, sort=False, as_index=False)[sum_cols].sum()

    if fanout:
        partials = partials.repartition(fanout).map_batches(
            comb, batch_format="pandas", batch_size=None
        )
    return partials.repartition(1).map_batches(comb, batch_format="pandas", batch_size=None)


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
    sep: str = ",",
) -> rd.Dataset:
    """Group-members-by-key collect (the reference's tar Record grouping,
    `manager.go:57-63`), emitted as an order-canonical CSV string per group
    so results are schema-stable and hashable. ONE groupby shuffle carrying
    only (group, value)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)[value_col].agg(list).reset_index()
        return g.rename(columns={value_col: "_vals"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)["_vals"].agg(
            lambda ls: sorted(x for sub in ls for x in sub)
        ).reset_index()
        g[out_col] = g["_vals"].map(lambda v: sep.join(map(str, v)))
        return g[[group_col, out_col]]

    # partial collect per batch (≤ groups rows each), single-task final merge
    # (collected values are the full group content — for huge groups use the
    # groupby(group).map_groups shuffle instead)
    return ds.map_batches(partial, batch_format="pandas").repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


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
    order_tiebreak: str | None = None,
) -> rd.Dataset:
    """Session windows: per user, a new session starts when the gap since
    the previous event exceeds ``gap_s``. ONE keyed shuffle (groupby user);
    per-group sessionization is a vectorized diff/cumsum. Returns
    (user_col, session_id, n_events)."""

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        by = [ts_col] + ([order_tiebreak] if order_tiebreak else [])
        g = g.sort_values(by, kind="mergesort")
        ts = g[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)  # unit-safe
        new = np.r_[True, np.diff(ts) > gap_s]
        sid = np.cumsum(new)
        out = pd.DataFrame({user_col: g[user_col].to_numpy(), "session_id": sid})
        out = out.groupby([user_col, "session_id"], sort=False).size().reset_index(name="n_events")
        out["session_id"] = out["session_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby(user_col).map_groups(sess, batch_format="pandas")


def topk_per_group(
    ds: rd.Dataset, group_col: str, order_col: str, k: int,
    descending: bool = True, tie_col: str | None = None,
) -> rd.Dataset:
    """Windowed rank: top-k rows per group (QUALIFY row_number() <= k).
    Per-batch partial top-k (the combiner — caps shuffle volume at
    k × groups × blocks) before the groupby finalize."""
    by = [order_col] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc, kind="mergesort").groupby(
            group_col, sort=False
        ).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(group_col, sort=False).head(k)

    # partials are ≤ k × groups × blocks rows — single-task final combine
    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.repartition(1).map_batches(final, batch_format="pandas", batch_size=None)
