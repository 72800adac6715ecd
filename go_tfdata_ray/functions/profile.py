"""One-pass dataset profiling: per-column min / max / null-rate / approx
distinct count in a SINGLE streaming scan.

At 100 TB you profile before you plan — but a naive profile is one full
pass PER statistic (or an exact ``unique`` shuffle per column). This
operator computes every column's statistics in one ``map_batches`` pass:
per-batch partials are a few hundred bytes per column (min, max, counts +
a 2^p-byte HLL register row), folded with an associative merge in one
coalesce task. Shuffle volume is O(columns × 2^p) regardless of rows.

List columns (e.g. ``tokens``) profile their LENGTHS (min/max/null of the
list size) — the useful statistic for sequence data; binary columns
profile byte lengths. NDV uses the same fixed-key-siphash HLL as
``sketch.approx_ndv`` (±~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..stages.exchange import exchange_coalesce_map
from .sketch import _estimate, _registers


def _col_partial(arr: pa.ChunkedArray, p: int) -> dict:
    typ = arr.type
    n = len(arr)
    nulls = arr.null_count
    valid = arr.drop_null()
    import pyarrow.compute as pc

    if pa.types.is_list(typ) or pa.types.is_large_list(typ):
        # offsets-only kernel — never materializes the list payloads
        v = pc.list_value_length(valid).to_numpy(zero_copy_only=False).astype(
            np.float64) if len(valid) else np.empty(0)
        kind = "list_len"
        vals_for_ndv = None
    elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        v = pc.binary_length(valid).to_numpy(zero_copy_only=False).astype(
            np.float64) if len(valid) else np.empty(0)
        kind = "byte_len"
        vals_for_ndv = None
    elif pa.types.is_floating(typ) or pa.types.is_integer(typ):
        # NDV hashes the RAW values: a float64 cast would collapse int64s
        # beyond 2^53 (consecutive snowflake-style ids land on one float)
        # and silently undercount far past the HLL's ±1.6%. min/max also
        # fold on the raw dtype; only the report column is float. Caveat:
        # a column whose BLOCKS mix int and float dtypes (mid-evolution
        # data) hashes 5 and 5.0 differently — profile after schema
        # normalization (stages/schema.py), which is where dtype-mixed
        # columns get resolved anyway.
        v = valid.to_numpy(zero_copy_only=False)  # raw dtype: min/max exact
        kind = "numeric"
        vals_for_ndv = v
    elif pa.types.is_string(typ) or pa.types.is_large_string(typ):
        s = valid.to_numpy(zero_copy_only=False)
        v = np.empty(0)
        kind = "string"
        vals_for_ndv = s
    elif pa.types.is_timestamp(typ):
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        kind = "numeric"
        vals_for_ndv = v  # exact epoch ints for the NDV hash; the report
        # column is float64 (min/max off by ≤256 ns at ns resolution)
    else:
        return {"kind": "opaque", "n": n, "nulls": nulls}
    out = {
        "kind": kind, "n": n, "nulls": nulls,
        "min": float(v.min()) if len(v) else None,
        "max": float(v.max()) if len(v) else None,
    }
    if vals_for_ndv is not None and len(vals_for_ndv):
        out["regs"] = _registers(vals_for_ndv, p).tobytes()
    if kind == "string" and len(vals_for_ndv):
        lens = pc.utf8_length(valid).to_numpy(zero_copy_only=False)
        out["min"], out["max"] = float(lens.min()), float(lens.max())
    return out


def profile(ds: rd.Dataset, columns: list[str] | None = None,
            p: int = 12) -> pd.DataFrame:
    """Profile ``columns`` (default: all) in one pass. Returns a DataFrame
    with one row per column: (column, kind, rows, null_rate, min, max,
    approx_ndv). min/max are value bounds for numeric/timestamp columns,
    LENGTH bounds for string/list/binary columns; approx_ndv is NaN where
    NDV is meaningless (lists/binary/opaque)."""
    import json

    def part(t: pa.Table) -> pa.Table:
        cols = columns or t.column_names
        blob = json.dumps(
            {c: {k: (v.hex() if isinstance(v, bytes) else v)
                 for k, v in _col_partial(t[c], p).items()}
             for c in cols}
        )
        return pa.table({"partial": pa.array([blob], pa.large_string())})

    def merge(t: pa.Table) -> pa.Table:
        acc: dict[str, dict] = {}
        for blob in t["partial"].to_pylist():
            for c, st in json.loads(blob).items():
                a = acc.setdefault(c, {"kind": st["kind"], "n": 0, "nulls": 0,
                                       "min": None, "max": None, "regs": None})
                a["n"] += st["n"]
                a["nulls"] += st["nulls"]
                for key, fold in (("min", min), ("max", max)):
                    v = st.get(key)
                    if v is not None:
                        a[key] = v if a[key] is None else fold(a[key], v)
                r = st.get("regs")
                if r is not None:
                    r = np.frombuffer(bytes.fromhex(r), dtype=np.uint8)
                    a["regs"] = r if a["regs"] is None else np.maximum(a["regs"], r)
        rows = {"column": [], "kind": [], "rows": [], "null_rate": [],
                "min": [], "max": [], "approx_ndv": []}
        for c, a in acc.items():
            rows["column"].append(c)
            rows["kind"].append(a["kind"])
            rows["rows"].append(a["n"])
            rows["null_rate"].append(a["nulls"] / a["n"] if a["n"] else 0.0)
            rows["min"].append(a["min"])
            rows["max"].append(a["max"])
            rows["approx_ndv"].append(
                float(round(_estimate(a["regs"]))) if a["regs"] is not None
                else float("nan"))
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    merged = exchange_coalesce_map(
        ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True),
        merge, batch_format="pyarrow",
    )
    out = merged.to_pandas()
    if "column" not in out.columns:  # zero-row input: no partials ever ran
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in
                             [("column", object), ("kind", object),
                              ("rows", np.int64), ("null_rate", np.float64),
                              ("min", np.float64), ("max", np.float64),
                              ("approx_ndv", np.float64)]})
    return out.sort_values("column").reset_index(drop=True)
