"""Distributed sketches: HyperLogLog approx-distinct (global + per-group),
Bloom membership, two-pass histogram approx-quantiles, and count-min
heavy hitters (candidates + exact recount).

The reference has no sketches (its only wide op is group-by-key collect,
/root/reference/tfdata/archive/manager.go:6-9); at 100 TB an exact
``unique`` on a high-cardinality column is an all-to-all shuffle of every
distinct value, while an HLL needs ONE pass and ships ``2^p`` one-byte
registers per block — the canonical combiner shape:

- partial: per batch, hash values (fixed-key siphash — deterministic across
  processes, like everything else in this repo), bucket by the low ``p``
  bits, register = max leading-zero rank of the high bits; emit one
  2^p-byte register row per batch.
- merge: element-wise max of registers — associative and commutative, so
  the final fold is a tiny tree over #blocks rows regardless of input size.
- estimate: classic bias-corrected harmonic mean (Flajolet et al. 2007),
  with the small-range linear-counting correction.

Standard error ≈ 1.04/sqrt(2^p): p=12 (4 KB/partial) → ~1.6%.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.exchange import exchange_coalesce_map


def _single_row(merged: "rd.Dataset", default):
    """First row of a one-row combine result, or ``default()`` when the
    input had no blocks at all (schemaless-empty corner: the coalesce ran
    nothing, so no identity row exists)."""
    rows = merged.take_all()
    return rows[0] if rows else default()


def _registers(values: np.ndarray, p: int) -> np.ndarray:
    """uint8[2^p] HLL registers for one batch of values."""
    h = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
    idx = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    rest = (h >> np.uint64(p)).astype(np.uint64)
    # rank = #leading zeros of the (64-p)-bit remainder + 1, via bit_length
    nbits = 64 - p
    # bit_length of rest: position of highest set bit
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl += (rest != 0).astype(np.int64)  # bit_length; 0 for rest == 0
    rank = (nbits - bl + 1).astype(np.int64)  # in [1, nbits+1]
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, idx, rank)
    return regs.astype(np.uint8)


def _estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    r = regs.astype(np.float64)
    est = alpha * m * m / np.sum(np.exp2(-r))
    if est <= 2.5 * m:  # linear counting for the small range
        zeros = int((regs == 0).sum())
        if zeros:
            return m * np.log(m / zeros)
    return float(est)


def _bloom_bits(values: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """Bit positions (flat, deduped) for a batch — double hashing
    h1 + i·h2 over two independent fixed-key siphashes."""
    obj = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(obj, categorize=False)
    h2 = pd.util.hash_array(obj, categorize=False, hash_key="beefcafe0badf00d")
    h2 |= np.uint64(1)  # odd step → full-period over power-of-two n_bits
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) & np.uint64(n_bits - 1)).ravel()


def build_bloom(ds: rd.Dataset, col: str, n_bits: int = 1 << 20, k: int = 7) -> bytes:
    """Distributed Bloom filter build: per-block bit arrays OR-folded —
    like the HLL, shuffle volume is n_bits/8 per block regardless of rows.
    FP rate ≈ (1 - e^{-k·n/m})^k; defaults give <1% up to ~10^5 keys.
    At 100 TB this is the semi-join prefilter: ship the filter once
    (``ray.put``), drop non-members inside map_batches, and only the
    survivors reach the exact verify."""
    assert n_bits & (n_bits - 1) == 0, "n_bits must be a power of two"

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        pos = _bloom_bits(t[col].to_numpy(zero_copy_only=False), n_bits, k)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    def merge(t: pa.Table) -> pa.Table:
        out = np.zeros(n_bits // 8, dtype=np.uint8)
        for b in t["bits"].to_pylist():
            np.bitwise_or(out, np.frombuffer(b, dtype=np.uint8), out=out)
        return pa.table({"bits": pa.array([out.tobytes()], pa.large_binary())})

    merged = exchange_coalesce_map(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        merge, batch_format="pyarrow",
    )
    return _single_row(
        merged, lambda: {"bits": np.zeros(n_bits // 8, np.uint8).tobytes()}
    )["bits"]


def bloom_contains(bloom: bytes, values: np.ndarray, k: int = 7) -> np.ndarray:
    """Vectorized membership test → bool mask (false positives possible,
    false negatives never)."""
    bits = np.frombuffer(bloom, dtype=np.uint8)
    n_bits = len(bits) * 8
    pos = _bloom_bits(values, n_bits, k).reshape(k, -1)
    ok = np.ones(pos.shape[1], dtype=bool)
    for row in pos:
        ok &= (bits[row >> np.uint64(3)]
               & (np.uint8(1) << (row & np.uint64(7)).astype(np.uint8))) != 0
    return ok


def approx_ndv(ds: rd.Dataset, col: str, p: int = 12) -> int:
    """Approximate number of distinct values of ``col`` in one streaming
    pass. Shuffle volume: one 2^p-byte register row per block, merged with
    an element-wise max fold — independent of both row count and
    cardinality."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _registers(t[col].to_numpy(zero_copy_only=False), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    def merge(t: pa.Table) -> pa.Table:
        bufs = t["regs"].to_pylist()
        out = np.zeros(1 << p, dtype=np.uint8)
        for b in bufs:
            np.maximum(out, np.frombuffer(b, dtype=np.uint8), out=out)
        return pa.table({"regs": pa.array([out.tobytes()], pa.large_binary())})

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = exchange_coalesce_map(partials, merge, batch_format="pyarrow")
    row = _single_row(
        merged, lambda: {"regs": np.zeros(1 << p, np.uint8).tobytes()}
    )
    regs = np.frombuffer(row["regs"], dtype=np.uint8)
    return 0 if not regs.any() else int(round(_estimate(regs)))


# -- approximate quantiles (two-pass histogram narrow-in) --------------------
#
# The exact per-group quantile operator (stages/relational.py:
# quantiles_per_group) must co-locate each group's full value multiset —
# the inherent cost of exactness. At larger-than-memory group sizes the
# documented scale path is this sketch: pass 1 finds the value range
# (per-batch min/max/count partials, tiny), pass 2 bins every value into a
# fixed-width histogram (one n_bins-long int64 vector per batch — size
# independent of row count) and folds histograms by vector add, an
# associative combiner. The quantile is read off the cumulative histogram
# with linear interpolation inside the bin: absolute value error is
# bounded by one bin width, (max-min)/n_bins, regardless of data size.


def _hist_quantiles(counts: np.ndarray, lo: float, hi: float,
                    qs: "dict[str, float]") -> "dict[str, float]":
    total = int(counts.sum())
    if total == 0 or hi <= lo:
        return {name: lo for name in qs}
    width = (hi - lo) / len(counts)
    cum = np.cumsum(counts)
    out = {}
    for name, q in qs.items():
        target = max(q * total, 1e-9)
        b = int(np.searchsorted(cum, target))
        b = min(b, len(counts) - 1)
        prev = cum[b - 1] if b else 0
        inside = (target - prev) / max(counts[b], 1)
        out[name] = lo + (b + min(inside, 1.0)) * width
    return out


def approx_quantiles(ds: rd.Dataset, col: str, qs: "dict[str, float]",
                     n_bins: int = 4096) -> "dict[str, float]":
    """Global approximate quantiles of a numeric column in two streaming
    passes. ``qs``: out-name → q in [0, 1]. Error ≤ (max-min)/n_bins."""

    def range_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    def range_merge(t: pa.Table) -> pa.Table:
        lo = pc.min(t["lo"]).as_py()
        hi = pc.max(t["hi"]).as_py()
        return pa.table({"lo": pa.array([lo]), "hi": pa.array([hi])})

    merged = exchange_coalesce_map(
        ds.map_batches(range_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        range_merge, batch_format="pyarrow",
    )
    row = _single_row(merged, lambda: {"lo": None, "hi": None})
    lo, hi = row["lo"], row["hi"]
    if lo is None:
        return {name: float("nan") for name in qs}
    span = max(hi - lo, 1e-300)

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.minimum(((v - lo) / span * n_bins).astype(np.int64), n_bins - 1)
        counts = np.bincount(b, minlength=n_bins).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.large_binary())})

    def hist_merge(t: pa.Table) -> pa.Table:
        out = np.zeros(n_bins, dtype=np.int64)
        for buf in t["counts"].to_pylist():
            out += np.frombuffer(buf, dtype=np.int64)
        return pa.table({"counts": pa.array([out.tobytes()], pa.large_binary())})

    merged = exchange_coalesce_map(
        ds.map_batches(hist_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        hist_merge, batch_format="pyarrow",
    )
    row = _single_row(
        merged, lambda: {"counts": np.zeros(n_bins, np.int64).tobytes()}
    )
    counts = np.frombuffer(row["counts"], dtype=np.int64)
    return _hist_quantiles(counts, lo, hi + 1e-300, qs)


def approx_quantiles_per_group(
    ds: rd.Dataset, group_col: str, value_col: str, qs: "dict[str, float]",
    n_bins: int = 1024, num_shards: int = 16,
) -> rd.Dataset:
    """Per-group approximate quantiles, two passes, both combiner-shaped:
    pass 1 folds per-group (min, max) partials group-sharded over the
    exchange and broadcasts the ranges (one small row per GROUP — ship via
    ``ray.put``, read once per worker); pass 2 bins each group's values
    into its own n_bins histogram, vector-adds histograms per group
    (group-sharded exchange), and reads the quantiles off. Shuffle volume:
    O(groups × n_bins), independent of row count. Error per group ≤
    (group max - group min)/n_bins. Returns (group_col, *qs-names)."""
    import ray as _ray

    from ..stages.exchange import exchange_group_map

    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(group_col, sort=False)[value_col].agg(["min", "max"]).reset_index()
        g["_shard"] = (
            pd.util.hash_array(g[group_col].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return g

    def range_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_col, sort=False).agg(
            **{"min": ("min", "min"), "max": ("max", "max")}
        ).reset_index()

    ranges = exchange_group_map(
        ds.map_batches(range_partial, batch_format="pandas"),
        range_merge, num_shards,
    ).to_pandas()
    lo = dict(zip(ranges[group_col], ranges["min"].astype(np.float64)))
    hi = dict(zip(ranges[group_col], ranges["max"].astype(np.float64)))
    ranges_ref = _ray.put((lo, hi))

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = _ray.get(ranges_ref)
        out_g, out_c = [], []
        for g, sub in df.groupby(group_col, sort=False):
            v = sub[value_col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            span = max(hi_m[g] - lo_m[g], 1e-300)
            b = np.minimum(((v - lo_m[g]) / span * n_bins).astype(np.int64),
                           n_bins - 1)
            out_g.append(g)
            out_c.append(np.bincount(b, minlength=n_bins).astype(np.int64).tobytes())
        out = pd.DataFrame({group_col: out_g, "_counts": out_c})
        out["_shard"] = (
            pd.util.hash_array(out[group_col].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return out

    def hist_merge(df: pd.DataFrame) -> pd.DataFrame:
        lo_m, hi_m = _ray.get(ranges_ref)
        rows = {group_col: []}
        for name in qs:
            rows[name] = []
        for g, sub in df.groupby(group_col, sort=False):
            counts = np.zeros(n_bins, dtype=np.int64)
            for buf in sub["_counts"]:
                counts += np.frombuffer(buf, dtype=np.int64)
            est = _hist_quantiles(counts, lo_m[g], hi_m[g] + 1e-300, qs)
            rows[group_col].append(g)
            for name in qs:
                rows[name].append(est[name])
        return pd.DataFrame(rows)

    return exchange_group_map(
        ds.map_batches(hist_partial, batch_format="pandas"),
        hist_merge, num_shards,
    )


def approx_ndv_per_group(
    ds: rd.Dataset, group_col: str, col: str, p: int = 12,
    num_shards: int = 16,
) -> rd.Dataset:
    """Per-group approximate distinct count of ``col`` in ONE pass — the
    grouped form of ``approx_ndv`` (COUNT(DISTINCT x) GROUP BY g at scale):
    per-batch per-group HLL register rows (2^p bytes per (group, batch)),
    folded per group with the element-wise max over a group-hash-sharded
    exchange. Shuffle volume is O(groups × blocks × 2^p) regardless of row
    count or cardinality. Returns (group_col, approx_ndv). Lower ``p`` for
    very high group cardinality (register rows dominate the exchange)."""
    from ..stages.exchange import exchange_group_map

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_g, out_r = [], []
        for g, sub in df.groupby(group_col, sort=False):
            out_g.append(g)
            out_r.append(_registers(sub[col].to_numpy(), p).tobytes())
        out = pd.DataFrame({group_col: out_g, "_regs": out_r})
        out["_shard"] = (
            pd.util.hash_array(out[group_col].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        gs, ndv = [], []
        for g, sub in df.groupby(group_col, sort=False):
            regs = np.zeros(1 << p, dtype=np.uint8)
            for b in sub["_regs"]:
                np.maximum(regs, np.frombuffer(b, dtype=np.uint8), out=regs)
            gs.append(g)
            ndv.append(int(round(_estimate(regs))))
        return pd.DataFrame({group_col: gs,
                             "approx_ndv": np.asarray(ndv, dtype=np.int64)})

    return exchange_group_map(
        ds.map_batches(partial, batch_format="pandas"), fold, num_shards
    )


def _cm_hash(values: np.ndarray, row: int, width: int) -> np.ndarray:
    """Row-``row`` count-min bucket per value (independent fixed-key hash
    families via distinct 16-byte hash keys — deterministic across
    processes, matching the repo's siphash convention)."""
    obj = np.asarray(values, dtype=object)
    key = f"cmsketch-row-{row:03d}".ljust(16, "0")[:16]
    return (pd.util.hash_array(obj, categorize=False, hash_key=key)
            % np.uint64(width)).astype(np.int64)


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 20,
                  width: int = 8192, depth: int = 4,
                  candidates_per_block: int = 128) -> rd.Dataset:
    """Exact top-k most frequent values of ``col`` in two passes — the
    heavy-hitters shape for corpora whose distinct-value set is far too
    large to groupby (token/word/URL frequencies at crawl scale):

    - pass 1 partial (per batch): exact local value counts (np.unique),
      folded into a depth x width COUNT-MIN matrix (a linear sketch — the
      merge is element-wise SUM, associative/commutative like the HLL
      max-fold) plus the batch's top ``candidates_per_block`` values by
      local count. One (depth*width int64 + C values) row ships per
      batch, independent of batch cardinality.
    - fold: sum the CM matrices, union the candidate sets, upper-bound
      each candidate's global count by the classic CM min-over-rows bound
      (overestimate-only), keep the top ``4k`` by bound. Past 256 partial
      rows the fold is TWO-LEVEL (hash-sharded per-shard sums, then a
      coalesce of ≤512 shard rows) so no single task is ever fed
      #blocks × depth×width bytes at crawl-scale block counts.
    - pass 2: exact recount of ONLY the surviving candidates (worker-
      broadcast set, per-batch filtered np.unique, tiny sum fold) → the
      returned (value, n) rows carry EXACT counts, ordered by
      (n desc, value asc) — deterministic and SQL-reproducible.

    Candidate-generation guarantee: a value is missed only if it ranked
    below the local top-C in EVERY batch that saw it; with C >> k the
    candidate union is generous for any realistically skewed (Zipfian)
    frequency law, and the pytest plants an adversarial uniform tail to
    check the bound in practice. Everything RETURNED is exactly counted
    regardless."""
    C = candidates_per_block

    def str_values(t: pa.Table) -> np.ndarray:
        # ONE stringification point shared by pass-1 partial and pass-2
        # recount: every hash site (CM update here, min-over-rows bound in
        # fold/prefold, recount membership) keys on the SAME string form.
        # Hashing raw native values in partial but stringified candidates
        # in fold would make the two hash families disagree for any
        # non-string column, silently garbling the candidate bounds.
        arr = t[col].drop_null()
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            arr = pc.cast(arr, pa.string())
        return arr.to_numpy(zero_copy_only=False)

    def partial(t: pa.Table) -> pa.Table:
        # nulls are not values: drop them (np.unique can't order None)
        uniq, cnt = np.unique(str_values(t), return_counts=True)
        cm = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            np.add.at(cm[d], _cm_hash(uniq, d, width), cnt)
        top = np.argsort(-cnt, kind="stable")[:C]
        return pa.table({
            "_cm": pa.array([cm.ravel().tobytes()], pa.binary()),
            "_cands": pa.array([list(uniq[top])], pa.list_(pa.string())),
        })

    def fold(t: pa.Table) -> pa.Table:
        cm = np.zeros(depth * width, dtype=np.int64)
        cands: set[str] = set()
        for i in range(t.num_rows):
            cm += np.frombuffer(t["_cm"][i].as_py(), dtype=np.int64)
            cands.update(t["_cands"][i].as_py())
        cm = cm.reshape(depth, width)
        arr = np.array(sorted(cands), dtype=object)
        bound = np.full(len(arr), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            np.minimum(bound, cm[d][_cm_hash(arr, d, width)], out=bound)
        keep = np.argsort(-bound, kind="stable")[: 4 * k]
        return pa.table({"value": pa.array([str(v) for v in arr[keep]])})

    # Per-shard candidate retention on the two-level path. Generous on
    # purpose: unlike the single-level fold, pruning HERE can in principle
    # drop a globally-heavy value that is spread thinly across shards while
    # >retention shard-locally-bursty values out-bound it in EVERY shard —
    # a documented two-level miss mode (everything returned is still
    # exactly counted). 4096 per shard keeps the final fold's candidate
    # union <= 512 * 4096 strings while making that adversarial shape need
    # thousands of colluding bursty values per shard.
    shard_retention = max(4 * k, 4096)

    def prefold(t: pa.Table) -> pa.Table:
        # shard-level partial fold: sum the shard's CM rows, keep the
        # shard's top candidates by the SHARD CM's min-over-rows bound
        # (the shard CM covers every block routed to it, so its bound
        # dominates each member block's counts)
        cm = np.zeros(depth * width, dtype=np.int64)
        cands: set[str] = set()
        for i in range(t.num_rows):
            cm += np.frombuffer(t["_cm"][i].as_py(), dtype=np.int64)
            cands.update(t["_cands"][i].as_py())
        cmv = cm.reshape(depth, width)
        arr = np.array(sorted(cands), dtype=object)
        bound = np.full(len(arr), np.iinfo(np.int64).max, dtype=np.int64)
        for d in range(depth):
            np.minimum(bound, cmv[d][_cm_hash(arr, d, width)], out=bound)
        keep = np.argsort(-bound, kind="stable")[:shard_retention]
        return pa.table({
            "_cm": pa.array([cm.tobytes()], pa.binary()),
            "_cands": pa.array([[str(v) for v in arr[keep]]],
                               pa.list_(pa.string())),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    n_rows = partials.count()
    if n_rows > 256:
        # two-level fold: one task summing EVERY block's (depth*width)
        # CM row would be fed #blocks * 8*depth*width bytes — hundreds of
        # GB at crawl-scale block counts. Hash-shard the partial rows
        # (any uniform deterministic key works; the CM bytes are one),
        # sum per shard, then coalesce the <=512 shard rows.
        from ..stages.exchange import exchange_group_map

        n_shards = min(-(-n_rows // 256), 512)

        def add_shard(t: pa.Table) -> pa.Table:
            # hash the FULL CM bytes: a short prefix is all-zero for most
            # blocks (row 0, buckets 0-7 miss every value with prob
            # exp(-8U/width)) and would collapse the fold onto one shard
            keys = np.asarray(t["_cm"].to_pylist(), dtype=object)
            sh = (pd.util.hash_array(keys, categorize=False)
                  % np.uint64(n_shards)).astype(np.int64)
            return t.append_column("_shard", pa.array(sh))

        partials = exchange_group_map(
            partials.map_batches(add_shard, batch_format="pyarrow"),
            lambda t: prefold(t.drop_columns(["_shard"])),
            n_shards, batch_format="pyarrow",
        )
    survivors = exchange_coalesce_map(partials, fold, batch_format="pyarrow")
    cand_set = frozenset(r["value"] for r in survivors.take_all())

    def recount(t: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(str_values(t), return_counts=True)
        mask = np.array([v in cand_set for v in uniq], dtype=bool)
        return pa.table({"value": pa.array(list(uniq[mask]), pa.string()),
                         "n": pa.array(cnt[mask].astype(np.int64))})

    def final(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("value", sort=False, as_index=False)["n"].sum()
        df = df.sort_values(["n", "value"], ascending=[False, True],
                            kind="stable").head(k)
        return pa.Table.from_pandas(df.reset_index(drop=True),
                                    preserve_index=False)

    return exchange_coalesce_map(
        ds.map_batches(recount, batch_format="pyarrow"),
        final, batch_format="pyarrow",
    )
