"""Query registry: one entry per operator/pipeline (SURVEY.md §2 + the
large-scale training-data ops), each with a DuckDB oracle where SQL can
express it.

Conventions for the driver's compare (row-count + schema + order-insensitive
value hash): every aggregate/computed column is explicitly CAST — ints to
int64 (BIGINT), floats to float64 — and named identically in the Ray code
and the SQL. Money sums are integer-scaled (prices have 2 decimals in the
test data) so sums are exact and order-insensitive.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..cdc.engine import CDCEngine
from ..functions import ann, dedup, text
from ..sources import wal as walmod
from ..stages import joins, relational as rel, transforms as tr
from ..stages.exchange import exchange_coalesce_map
from ..stages.transforms import ByKey, ByKeyValue, ByPrefix, BySubstring, BySuffix


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read_docs(sf_dir: str, columns) -> "rd.Dataset":
    """Read documents.parquet split into ~one block per CPU. At test SFs
    the table is ONE small file -> Ray's default gives it one block, and
    every CPU-bound per-doc stage downstream (shingle hashing, signatures,
    language ID) serializes on a single task. At real corpus scale the
    file count provides the blocks and an override like this should be
    dropped (it would CAP parallelism); here the table is a single file by
    construction."""
    import ray
    n = max(int(ray.cluster_resources().get("CPU", 8)), 8)
    return rd.read_parquet(_t(sf_dir, "documents"), columns=columns,
                           override_num_blocks=n)


def _i64(t: pa.Table, *cols: str) -> pa.Table:
    for c in cols:
        t = t.set_column(t.column_names.index(c), c, pc.cast(t[c], pa.int64()))
    return t


# --------------------------------------------------------------------------
# reference transform operators (§2.2-2.4)
# --------------------------------------------------------------------------

def q_select_selections(sf_dir: str):
    """SampleSelectionsTransformation — the UNION of ByKey + ByPrefix +
    BySuffix + BySubstring selections in one transform, exactly the
    reference's semantics (selection.go:52-69, transformation.go:78-101):
    each selector contributes its matching keys; unmatched columns
    (l_quantity, l_tax) are dropped."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
                 "l_quantity", "l_tax"],
    )
    return tr.select(ds, ByKey("l_orderkey"), ByPrefix("l_r"), BySuffix("status"),
                     BySubstring("linen"))


def q_predicate_keyvalue(sf_dir: str):
    """ByKeyValue + FilterEmpty = row predicate (test/filter_test.go:17-47)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type"])
    ds = tr.select(ds, ByKey("event_id"), ByKeyValue("event_type", "click"))
    return tr.filter_empty(ds, key_col="event_id")


def q_udf_revenue(sf_dir: str):
    """SampleF-style per-batch UDF (transformation.go:128-142), vectorized."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("revenue", rev)
        return _i64(t.select(["l_orderkey", "l_linenumber", "revenue"]), "l_linenumber")

    return tr.sample_f(ds, revenue)


def q_coerce_widen(sf_dir: str):
    """TypesMap widening int32→int64 (transformer.go:144-192 analog)."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber"])
    ds = tr.rename(ds, "linenumber64", ["l_linenumber"])
    ds = ds.map_batches(
        lambda t: t.select(["l_orderkey", "linenumber64"]), batch_format="pyarrow"
    )
    return tr.coerce(ds, {"l_orderkey": pa.int64(), "linenumber64": pa.int64()})


def q_pipeline_chain(sf_dir: str):
    """Full DefaultPipeline chain: rename → select → filter_empty
    (mirrors test/pipeline_test.go:135-184). The rename uses MULTIPLE
    sources (last-src-wins, srcs kept — transformation.go:54-76): event_id
    is shadowed by event_type, so etype == event_type."""
    from .builder import DefaultPipeline
    from ..stages.transforms import ByBatchF

    def purchase_cells(t: pa.Table):
        mask = pc.equal(t["etype"], pa.scalar("purchase")).to_numpy(zero_copy_only=False)
        mask = np.asarray(mask, dtype=bool)
        return {"value": mask, "etype": mask}

    p = (
        DefaultPipeline()
        .from_parquet(_t(sf_dir, "events"), columns=["event_id", "event_type", "value"])
        .rename("etype", ["event_id", "event_type"])
        .select(ByKey("event_id"), ByBatchF(purchase_cells))
        .with_samples_stage(lambda ds: tr.filter_empty(ds, key_col="event_id"))
        .collect()
    )
    return p.do()


# --------------------------------------------------------------------------
# wide operations: aggregate / sort / distinct / joins / window
# --------------------------------------------------------------------------

def q_agg_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate with PARTIAL pre-aggregation inside
    map_batches (the combiner pattern) before the small groupby shuffle.
    Money is integer-scaled (2-decimal prices) so sums are exact."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner: pc kernels + pa.TableGroupBy, zero pandas
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        base_c = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                         pa.int64())
        dpct = pc.cast(pc.round(pc.multiply(
            pc.subtract(1.0, t["l_discount"]), 100.0)), pa.int64())
        tb = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty,
            "base_c": base_c,
            "disc_c4": pc.multiply(base_c, dpct),
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        return rel.sum_groupby_arrow(tb, ["l_returnflag", "l_linestatus"],
                                     ["qty", "base_c", "disc_c4", "n"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536, zero_copy_batch=True)
    out = rel.combine_partials(
        partials, ["l_returnflag", "l_linestatus"], ["qty", "base_c", "disc_c4", "n"]
    )
    return out.map_batches(
        lambda t: _i64(
            t.rename_columns(
                ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
                 "sum_disc_c4", "count_order"]
            ),
            "sum_qty", "sum_base_cents", "sum_disc_c4", "count_order",
        ),
        batch_format="pyarrow",
    )


def q_topk_orders(sf_dir: str):
    """Top-k two ways in one result (kind-tagged union): 'global' = 10
    priciest orders overall via per-block partial top-k + one tiny final
    (``rel.topk_global`` — k rows per block move, vs every row through
    ``ds.sort``'s all-to-all exchange); 'group' = windowed rank via the
    per-batch-partial top-k combiner (2 priciest per priority class).
    Also exercises ``ds.union`` across same-schema legs."""
    ds = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def tag(kind):
        def f(t: pa.Table) -> pa.Table:
            cols = t.select(["o_orderkey", "o_orderpriority", "o_totalprice"])
            return cols.add_column(0, "kind", pa.array([kind] * len(t)))
        return f

    top_global = rel.topk_global(
        ds, "o_totalprice", k=10, descending=True, tie_col="o_orderkey"
    ).map_batches(tag("global"), batch_format="pyarrow")
    top_group = rel.topk_per_group(
        ds, "o_orderpriority", "o_totalprice", k=2, descending=True, tie_col="o_orderkey"
    ).map_batches(tag("group"), batch_format="pyarrow")
    return top_global.union(top_group)


def q_distinct(sf_dir: str):
    """distinct via per-batch dedup (combiner) + content-sharded groupby
    final — distributed output, no single-task final (unbounded cardinality
    at scale)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type"])
    return rel.distinct(ds)


def q_join_broadcast(sf_dir: str):
    """Broadcast (dimension) join: customer is ray.put once, merged per
    batch; then grouped rollup by nation."""
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    cust = pd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]).rename(
        columns={"c_custkey": "o_custkey"}
    )
    joined = joins.broadcast_join(orders, cust, on="o_custkey")

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({
            "c_nationkey": t["c_nationkey"],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
            "price_c": pc.round(pc.multiply(
                t["o_totalprice"].cast(pa.float64()),
                pa.scalar(100.0))).cast(pa.int64()),
        })
        return rel.sum_groupby_arrow(tb, ["c_nationkey"], ["n", "price_c"])

    out = rel.combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"), ["c_nationkey"], ["n", "price_c"]
    )
    return out.map_batches(
        lambda t: _i64(t.rename_columns(["c_nationkey", "n_orders", "sum_price_cents"]),
                       "c_nationkey", "n_orders", "sum_price_cents"),
        batch_format="pyarrow",
    )


def q_join_bucketed(sf_dir: str):
    """Partitioned hash join (both sides large): bucket by key hash, ONE
    exchange, per-bucket merge; rollup by priority. Uses the object-store
    exchange (per-bucket block slices shipped directly, no Dataset
    sort-shuffle control plane — measured 4.2 s → ~2 s at sf0.1/32 cpus);
    the groupby-shuffle variant stays available as ``bucket_hash_join``
    (needed for salted skew) and the disk-backed one as ``join_storage``."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])
    li = li.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_quantity"]), batch_format="pyarrow"
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    joined = joins.object_exchange_hash_join(li, orders, on="o_orderkey", num_buckets=32)

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
            "qty": pc.round(t["l_quantity"].cast(pa.float64())).cast(pa.int64()),
        })
        return rel.sum_groupby_arrow(tb, ["o_orderpriority"], ["n", "qty"])

    out = rel.combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"), ["o_orderpriority"], ["n", "qty"]
    )
    return out.map_batches(
        lambda t: _i64(t.rename_columns(["o_orderpriority", "n_items", "sum_qty"]),
                       "n_items", "sum_qty"),
        batch_format="pyarrow",
    )


def q_join_storage(sf_dir: str):
    """Same join as join_bucketed via the storage-exchange strategy (run
    files with bucket-aligned row groups — no object-store sort shuffle)."""
    li = rd.read_parquet(_t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"])
    li = li.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_quantity"]), batch_format="pyarrow"
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"])
    joined = joins.storage_hash_join(li, orders, on="o_orderkey", num_buckets=64)

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
            "qty": pc.round(t["l_quantity"].cast(pa.float64())).cast(pa.int64()),
        })
        return rel.sum_groupby_arrow(tb, ["o_orderpriority"], ["n", "qty"])

    out = rel.combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"), ["o_orderpriority"], ["n", "qty"]
    ).map_batches(
        lambda t: _i64(t.rename_columns(["o_orderpriority", "n_items", "sum_qty"]),
                       "n_items", "sum_qty"),
        batch_format="pyarrow",
    )
    # drain the tiny final BEFORE sweeping the join's spilled run files
    res = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    joins.cleanup_join_spill()
    return res


def q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP: item counts + quantity at (flag, status), (flag)
    and grand-total levels. Input aggregates once (combiner); coarser
    levels derive from the finest result."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "n": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "qty": pc.cast(pc.round(t["l_quantity"]), pa.int64()),
        })

    out = rel.rollup(ds.map_batches(prep, batch_format="pyarrow"),
                     ["l_returnflag", "l_linestatus"], ["n", "qty"])
    return out.map_batches(
        lambda t: _i64(t.rename_columns(
            ["l_returnflag", "l_linestatus", "n_items", "sum_qty"]),
            "n_items", "sum_qty"),
        batch_format="pyarrow",
    )


def q_window_hourly(sf_dir: str):
    """Streaming-shaped tumbling window: count per (user_id, hour bucket).
    Partial counts per batch, then the groupby shuffle over partials."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native combiner (ts is µs since epoch → hour bucket)
        us = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb = pa.table({
            "user_id": t["user_id"],
            "hour_bucket": pa.array(us // 3_600_000_000),
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        return rel.sum_groupby_arrow(tb, ["user_id", "hour_bucket"], ["n"])

    out = rel.combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "hour_bucket"], ["n"], fanout=8,  # many (user, hour) groups
    )
    return out.map_batches(
        lambda t: _i64(t.rename_columns(["user_id", "hour_bucket", "n_events"]), "n_events"),
        batch_format="pyarrow",
    )


def q_window_sliding(sf_dir: str):
    """Sliding window (60 min window, 15 min slide): each event lands in 4
    windows — replicated INSIDE the per-batch partial (vectorized tile),
    so the shuffle only carries (window_start, count) partials."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        s = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[s]").astype(np.int64)
        base = (s // 900) * 900
        ws = np.concatenate([base - k * 900 for k in range(4)])
        ws_u, cnt = np.unique(ws, return_counts=True)
        return pa.table({"window_start": ws_u, "n": cnt.astype(np.int64)})

    out = rel.combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["window_start"], ["n"]
    )
    return out.map_batches(
        lambda t: _i64(t.rename_columns(["window_start", "n_events"]),
                       "window_start", "n_events"),
        batch_format="pyarrow",
    )


def q_join_range(sf_dir: str):
    """Range join, by-key routed: for each purchase, how many same-user
    events fall within [purchase.ts, purchase.ts + 30 min]. Object-store
    exchange (all rows of a user share a bucket slice), per-bucket masked
    merge, then partial-count combine on the purchase id."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    # row-group predicate pushdown: only purchase rows leave storage
    pur = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"],
        filter=pc.field("event_type") == "purchase",
    )

    def mk_windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        ts = t["ts"]
        per_sec = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts.type.unit]
        return pa.table({
            "purchase_id": t["event_id"],
            "user_id": t["user_id"],
            "lo": ts,
            "hi": pc.add(ts, pa.scalar(30 * 60 * per_sec,
                                       pa.duration(ts.type.unit))),
        })

    windows = pur.map_batches(mk_windows, batch_format="pyarrow")
    joined = joins.object_exchange_range_join(
        ev, windows, on="ts", lo="lo", hi="hi", by="user_id")

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({
            "purchase_id": t["purchase_id"],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
        })
        return rel.sum_groupby_arrow(tb, ["purchase_id"], ["n"])

    out = rel.combine_partials(
        joined.map_batches(partial, batch_format="pyarrow"), ["purchase_id"], ["n"]
    )
    return out.map_batches(
        lambda t: _i64(t.rename_columns(["purchase_id", "n_events"]),
                       "purchase_id", "n_events"),
        batch_format="pyarrow",
    )


def q_join_range_bins(sf_dir: str):
    """Range join, binned (no key): parts whose retail price falls in a
    nation-indexed price band [n*200, n*200+150]. Intervals replicate into
    the price bins they overlap; each matching pair meets in the part's
    bin — no key column shared between the sides."""
    part = rd.read_parquet(_t(sf_dir, "part"), columns=["p_partkey", "p_retailprice"])
    nat = rd.read_parquet(_t(sf_dir, "nation"), columns=["n_nationkey"])

    def mk_bands(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_nationkey": df["n_nationkey"],
                "lo": df["n_nationkey"] * 200.0,
                "hi": df["n_nationkey"] * 200.0 + 150.0,
            }
        )

    bands = nat.map_batches(mk_bands, batch_format="pandas")
    joined = joins.object_exchange_range_join(
        part, bands, on="p_retailprice", lo="lo", hi="hi", bin_width=50.0
    )
    return joined.map_batches(
        lambda t: _i64(t.select(["p_partkey", "n_nationkey"]),
                       "p_partkey", "n_nationkey"),
        batch_format="pyarrow",
    )


def q_rolling_value(sf_dir: str):
    """Per-key running aggregate (SQL windowed SUM ... ROWS UNBOUNDED
    PRECEDING): cumulative event value per user in (ts, event_id) order.
    Values go through integer CENTS (floor) so the accumulation is
    bit-exact in both engines."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
        return t.drop_columns(["value"]).append_column("cents", pa.array(c))

    out = rel.rolling_per_key(
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id", ["ts", "event_id"], "cents", out_col="run_cents",
    )
    return out.map_batches(
        lambda t: _i64(t.select(["event_id", "user_id", "run_cents"]), "run_cents"),
        batch_format="pyarrow",
    )


def q_quantiles_grouped(sf_dir: str):
    """Exact per-group discrete quantiles (median + p95 order price per
    priority class) — quantile_disc semantics, value column pruned at the
    read so only (group, value) pairs shuffle."""
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderpriority", "o_totalprice"])
    return rel.quantiles_per_group(
        ds, "o_orderpriority", "o_totalprice", {"p50": 0.5, "p95": 0.95}
    )


def q_sampling_chain(sf_dir: str):
    """The sampling family composed end-to-end: seeded ``random_shuffle``
    (content-preserving epoch reshuffle) → deterministic 1/20 key-mod
    sample → stratified pick of 3 orders per priority class by a Knuth-hash
    order on the key (replayable, no RNG; per-batch partial top-k caps the
    shuffle at k × groups × blocks). Every stage's selection is
    order-independent, so the composed output is closed-form for the
    oracle while the shuffle is verified content-preserving by passage."""
    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_orderpriority"])
    ds = ds.random_shuffle(seed=7)
    ds = rel.sample_mod(ds, "o_orderkey", 20)

    def hsh(t: pa.Table) -> pa.Table:
        h = (t["o_orderkey"].to_numpy(zero_copy_only=False) * 2654435761) % 4294967296
        return t.append_column("_h", pa.array(h.astype(np.int64)))

    out = rel.topk_per_group(
        ds.map_batches(hsh, batch_format="pyarrow", zero_copy_batch=True),
        "o_orderpriority", "_h", k=3, descending=False, tie_col="o_orderkey",
    )
    return out.map_batches(lambda t: t.select(["o_orderkey", "o_orderpriority"]),
                           batch_format="pyarrow")


def q_approx_ndv(sf_dir: str):
    """HyperLogLog approx-distinct of the event user population: one
    streaming pass, 4 KB of registers per block on the wire (vs an exact
    unique's all-to-all value shuffle). Deterministic (fixed-key siphash) —
    error bound vs exact asserted in pytest (no SQL oracle: DuckDB's
    approx_count_distinct is a different sketch)."""
    from ..functions import sketch

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    n = sketch.approx_ndv(ds, "user_id", p=12)
    return pa.table({"approx_ndv": pa.array([n], pa.int64())})


def q_explode_embeddings(sf_dir: str):
    """flat_map / unnest: one row per embedding element."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return rel.explode_list(ds, "embedding", value_name="value", value_type=pa.float64())


def q_inverted_index(sf_dir: str):
    """Kind-tagged composite over the same exploded (token, doc_id)
    postings: 'postings' = inverted text index (per-doc distinct terms →
    order-canonical posting list per token; the group-collect combiner —
    at scale the token key is the natural partition key for serving);
    'hh' = top-20 tokens by document frequency via the count-min
    heavy-hitters sketch (candidate generation + exact recount,
    ``functions/sketch.py:heavy_hitters``) — counts are exact, so the leg
    is SQL-closed-form; 'expect' = the distributed data-quality audit
    (`cdc/expect.py:audit_expectations` — per-rule violation counts, the
    counting twin of the ingest quarantine gate), warn-policy rules so
    each count is an independent SQL aggregate."""
    import re as _re

    from ..functions import sketch

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    pat = _re.compile(r"[a-z]+")

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        toks, docs = [], []
        for did, txt in zip(df["doc_id"].to_numpy(), df["text"].to_numpy()):
            terms = set(pat.findall(str(txt).lower()))
            toks.extend(terms)
            docs.extend([did] * len(terms))
        return pd.DataFrame({"token": toks, "doc_id": np.array(docs, dtype=np.int64)})

    # three consumers (posting collect + heavy-hitters pass 1 + exact
    # recount pass 2) would each re-run the regex explode on a lazy
    # Dataset — materialize once (postings rows are (token, doc_id) only,
    # object-store-resident/spillable)
    exploded = ds.map_batches(postings, batch_format="pandas").materialize()
    idx = rel.collect_group_csv(exploded, "token", "doc_id", out_col="payload")
    idx = idx.map_batches(
        lambda t: t.append_column("kind", pa.array(["postings"] * len(t))),
        batch_format="pyarrow",
    )
    hh = sketch.heavy_hitters(exploded, "token", k=20)
    hh = hh.map_batches(
        lambda t: pa.table({
            "token": t["value"],
            "payload": pc.cast(t["n"], pa.string()),
            "kind": pa.array(["hh"] * len(t)),
        }),
        batch_format="pyarrow",
    )
    from ..cdc.expect import (audit_expectations, expect_matches,
                              expect_max_len, expect_min_len)

    aud = audit_expectations(
        _read_docs(sf_dir, columns=["text"]),
        [expect_min_len("text", 200, on_fail="warn"),
         expect_max_len("text", 2000, on_fail="warn"),
         expect_matches("text", "[0-9]", on_fail="warn")])
    exp = aud.map_batches(
        lambda t: pa.table({
            "token": t["rule"],
            "payload": pc.cast(t["violations"], pa.string()),
            "kind": pa.array(["expect"] * len(t)),
        }),
        batch_format="pyarrow",
    )
    return idx.union(hh).union(exp)


def _big_order_custkeys(sf_dir: str):
    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return ds.unique("o_custkey")


def q_join_outer(sf_dir: str):
    """FULL OUTER bucketed join: customers of nations 0-9 vs per-customer
    counts of >400k orders — each side has keys absent from the other.
    NULL sides are coalesced to sentinels ('' / -1) so the compare carries
    no null-typed cells."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name", "c_nationkey"])
    cust = cust.map_batches(
        lambda t: t.filter(pc.less(t["c_nationkey"], 10)).select(["c_custkey", "c_name"]),
        batch_format="pyarrow",
    )
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def big_counts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["o_totalprice"], 400000.0))
        g = t.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return g.rename_columns(["c_custkey", "n_big"])

    big = rel.combine_partials(
        orders.map_batches(big_counts, batch_format="pyarrow"),
        ["c_custkey"], ["n_big"]
    )
    joined = joins.bucket_hash_join(cust, big, on="c_custkey", how="outer")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].astype("int64"),
                "c_name": df["c_name"].fillna("").astype(str),
                "n_big": df["n_big"].fillna(-1).astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def q_join_semi_bloom(sf_dir: str):
    """Semi join through a distributed-built Bloom prefilter + exact
    verify — the at-scale shape where the build side is too large to ship
    as a set: the filter (8 KB here) broadcasts instead, and only bloom
    survivors hit the exact check. Same oracle as join_semi."""
    from ..functions import sketch

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])
    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    bloom = sketch.build_bloom(big, "o_custkey", n_bits=1 << 16)
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])

    def prefilter(t: pa.Table) -> pa.Table:
        mask = sketch.bloom_contains(bloom, t["c_custkey"].to_numpy(zero_copy_only=False))
        return t.filter(pa.array(mask))

    survivors = cust.map_batches(prefilter, batch_format="pyarrow",
                                 zero_copy_batch=True)
    return joins.semi_join_filter(survivors, _big_order_custkeys(sf_dir),
                                  on="c_custkey")


def q_join_asof(sf_dir: str):
    """As-of join: for each event, the user's most recent PRIOR purchase
    (strict <). Purchases deduped to one per (user, ts) by max event_id so
    the tie-break is well-defined in both engines."""
    ev = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    # row-group predicate pushdown: only purchase rows leave storage
    pur = rd.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "event_type"],
        filter=pc.field("event_type") == "purchase",
    )
    pur = pur.map_batches(lambda t: t.select(["event_id", "user_id", "ts"]),
                          batch_format="pyarrow")

    # unique per (user, ts) by max event_id (well-defined asof tie-break) —
    # deduped INSIDE the per-bucket merge, not in a single-task pre-pass
    out = joins.asof_join(ev, pur, by="user_id", on="ts",
                          allow_exact_matches=False, num_buckets=16,
                          right_dedup_max="event_id")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "prev_purchase": df["event_id_r"].fillna(-1).astype("int64"),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment (8/1/1 by doc_id % 10)."""
    ds = _read_docs(sf_dir, columns=["doc_id"])
    return rel.assign_split(ds, "doc_id")


def q_sessionize(sf_dir: str):
    """Session windows (gap > 30 min) per user — keyed shuffle + vectorized
    per-group diff/cumsum."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "event_id"])
    return rel.sessionize(ds, "user_id", "ts", gap_s=1800, order_tiebreak="event_id")


def q_join_semi_anti(sf_dir: str):
    """Semi + anti join in one kind-tagged result: customers with ≥1
    >400k order ('semi') and customers with none ('anti'), both via the
    broadcast key-set filter (Bloom at scale), unioned — every input row
    appears in exactly one leg."""
    cust = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    keys = _big_order_custkeys(sf_dir)

    def tag(kind):
        def f(t: pa.Table) -> pa.Table:
            return t.add_column(0, "kind", pa.array([kind] * len(t)))
        return f

    semi = joins.semi_join_filter(cust, keys, on="c_custkey").map_batches(
        tag("semi"), batch_format="pyarrow")
    anti = joins.semi_join_filter(cust, keys, on="c_custkey", anti=True).map_batches(
        tag("anti"), batch_format="pyarrow")
    return semi.union(anti)


# --------------------------------------------------------------------------
# CDC (the north rule) — over the deterministic sf-linked WAL
# --------------------------------------------------------------------------

def _lake_dir_for(sf_dir: str) -> str:
    return os.path.join("/tmp/graft_lake", f"sf{walmod.sf_from_dir(sf_dir):g}-v1")


def replayed_engine(sf_dir: str, num_partitions: int = 16) -> CDCEngine:
    """Generate (idempotently) the sf-linked WAL and replay it into the
    sf-linked lake. Re-entrant: committed epochs are skipped, so repeat
    calls (e.g. the two CDC queries) reuse the materialized lake."""
    wal_dir, _files = walmod.ensure_wal_for_sf(sf_dir)
    eng = CDCEngine(_lake_dir_for(sf_dir), num_partitions=num_partitions)
    eng.apply_wal(wal_dir)
    return eng


def _digest_ds(ds, extra_cols: tuple[str, ...] = ()):
    """Per-row token digests (sum, first, last, n_tok) — the SQL-checkable
    projection of exact token-array state. ``extra_cols`` pass through
    (e.g. op/seq for the changes feed)."""

    def digest(t: pa.Table) -> pa.Table:
        toks = t["tokens"].combine_chunks()
        vals = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # cumsum-difference (reduceat chokes on EMPTY lists — tombstone rows
        # in the changes feed have tokens=[], whose start offset can equal
        # len(vals)); empty lists fall out as cs[i]-cs[i] = 0 naturally
        cs = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(vals)])
        sums = cs[offs[1:]] - cs[offs[:-1]]
        if len(vals):
            first = np.where(offs[:-1] < offs[1:], vals[np.minimum(offs[:-1], len(vals) - 1)], 0)
            last = np.where(offs[:-1] < offs[1:], vals[np.maximum(offs[1:] - 1, 0)], 0)
        else:  # every list empty (all-tombstone block)
            first = last = np.zeros(len(offs) - 1, dtype=np.int64)
        cols = {
            "doc_id": t["doc_id"],
            "n_tok": pc.cast(t["n_tok"], pa.int64()),
            "source": t["source"],
            "tok_sum": pa.array(sums, pa.int64()),
            "tok_first": pa.array(first, pa.int64()),
            "tok_last": pa.array(last, pa.int64()),
        }
        for c in extra_cols:
            col = t[c]
            cols[c] = pc.cast(col, pa.int64()) if pa.types.is_integer(col.type) else col
        return pa.table(cols)

    return ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)


def q_cdc_replay_digest(sf_dir: str):
    """Full WAL replay → merged final state, PLUS the same state after
    COMPACT (deltas folded into per-partition bases, tombstones physically
    dropped) + vacuum on a second lake, PLUS the same state after RESHARD
    (partition-count change) on a third, PLUS a FOLLOWER lake replicated
    off the resharded source's CDC feed — stage-tagged union with per-row
    token digests. All four stages must carry identical rows, so the
    oracle is the same digest four times (exact token-list equality is
    asserted in pytest)."""

    def tag(stage):
        def f(t: pa.Table) -> pa.Table:
            return t.add_column(0, "stage", pa.array([stage] * len(t)))
        return f

    replay = _digest_ds(replayed_engine(sf_dir).scan()).map_batches(
        tag("replay"), batch_format="pyarrow")

    wal_dir, _files = walmod.ensure_wal_for_sf(sf_dir)
    lake = os.path.join("/tmp/graft_lake", f"sf{walmod.sf_from_dir(sf_dir):g}-compacted")
    eng = CDCEngine(lake, num_partitions=16)
    eng.apply_wal(wal_dir)
    if eng.manifest.epochs:  # uncompacted epoch delta segments present
        eng.compact()
        eng.vacuum()
    compacted = _digest_ds(eng.scan()).map_batches(tag("compacted"),
                                                   batch_format="pyarrow")

    # third leg: the same state after RESHARD (hash-partition-count change
    # as a 2-stage storage exchange). The target ping-pongs 16↔24 so every
    # run performs a REAL reshard on the cached lake, not a no-op.
    lake_rs = os.path.join("/tmp/graft_lake",
                           f"sf{walmod.sf_from_dir(sf_dir):g}-resharded")
    eng_rs = CDCEngine(lake_rs, num_partitions=16)
    eng_rs.apply_wal(wal_dir)
    eng_rs.reshard(24 if eng_rs.num_partitions == 16 else 16)
    resharded = _digest_ds(eng_rs.scan()).map_batches(tag("resharded"),
                                                      batch_format="pyarrow")

    # fourth leg: a FOLLOWER lake synced off the resharded source's CDC
    # feed (cdc/replicate.py). The reshard above folds the source's epoch
    # segments every run, so each run exercises a REAL distributed full
    # resync (snapshot upserts + anti-join tombstones), never a cached
    # no-op; its final state must carry the same rows as every other leg.
    from ..cdc.replicate import sync_replica

    lake_rep = os.path.join("/tmp/graft_lake",
                            f"sf{walmod.sf_from_dir(sf_dir):g}-replica")
    sync_replica(lake_rs, lake_rep, num_partitions=8)
    replicated = _digest_ds(CDCEngine(lake_rep).scan()).map_batches(
        tag("replicated"), batch_format="pyarrow")
    return replay.union(compacted).union(resharded).union(replicated)


def q_cdc_changes_digest(sf_dir: str):
    """Incremental CDC-out feed: the NET change set (latest (epoch, seq)
    per key, tombstones retained) committed after the first epoch's
    manifest version — what a downstream consumer applies to roll its copy
    forward. Digested per-row for the SQL hash check."""
    wal_dir, _files = walmod.ensure_wal_for_sf(sf_dir)
    lake = os.path.join("/tmp/graft_lake",
                        f"sf{walmod.sf_from_dir(sf_dir):g}-changes-v1")
    eng = CDCEngine(lake, num_partitions=16)
    eng.apply_wal(wal_dir)  # idempotent: committed epochs are skipped
    first_epoch = walmod.list_segments(wal_dir)[0][0]
    v1 = eng.version_at_epoch(first_epoch)
    return _digest_ds(eng.changes(v1, collapsed=True), extra_cols=("op", "seq"))


def q_cdc_rollups(sf_dir: str):
    """Per-source rollup computed TWO ways, kind-tagged: 'scan' = grouped
    aggregate over the merged lake (partial combine per batch, one small
    groupby); 'incr' = the same rollup maintained INCREMENTALLY by a CDC
    consumer refreshed from the changes feed (+ pre-image lookups at the
    old version) after every epoch, never rescanning the lake. The two
    kinds must agree, so the oracle is one GROUP BY emitted twice."""
    from ..cdc.consumer import SourceRollup

    eng = replayed_engine(sf_dir)
    ds = eng.scan(columns=["source", "n_tok"])

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table({
            "source": t["source"],
            "n": pa.array(np.ones(len(t), dtype=np.int64)),
            "tok": t["n_tok"].cast(pa.int64()),
        })
        return rel.sum_groupby_arrow(tb, ["source"], ["n", "tok"])

    out = rel.combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"), ["source"], ["n", "tok"]
    )
    scan_df = out.map_batches(
        lambda t: _i64(t.rename_columns(["source", "n_docs", "total_tokens"]),
                       "n_docs", "total_tokens"),
        batch_format="pyarrow",
    ).to_pandas()
    scan_df.insert(0, "kind", "scan")

    wal_dir, _files = walmod.ensure_wal_for_sf(sf_dir)
    lake = os.path.join("/tmp/graft_lake",
                        f"sf{walmod.sf_from_dir(sf_dir):g}-incr-v1")
    eng2 = CDCEngine(lake, num_partitions=16)
    view = SourceRollup(eng2)
    applied_any = False
    for e, paths in walmod.list_segments(wal_dir):
        st = eng2.apply_epoch(e, paths)
        if not st.get("skipped"):
            applied_any = True
            view.refresh()
    if not applied_any:  # lake pre-materialized from an earlier run
        view.full_refresh()
    incr_df = view.table().to_pandas()
    incr_df.insert(0, "kind", "incr")
    return pd.concat([scan_df, incr_df], ignore_index=True)


def q_tar_pipeline(sf_dir: str):
    """Archive front doors E2E. 'greedy'/'seek' = the reference's primary
    input (tar.go:50-55): build a tarball from `documents` (one .txt + one
    .cls member per doc), read it back through both tar reader tiers,
    group members by key, emit per-doc byte-length + lang. 'warc' = the
    same documents as an ISO 28500 crawl drop (`sources/warc.py`,
    per-record gzip members): one response record per doc, lang riding
    the Content-Type header, HTTP envelope stripped on read. The original
    table is the oracle for all three legs."""
    import tarfile as _tarfile

    tar_path = f"/tmp/graft_tar/sf{walmod.sf_from_dir(sf_dir):g}.tar"
    os.makedirs(os.path.dirname(tar_path), exist_ok=True)
    if not os.path.exists(tar_path):
        import io as _io

        docs = pd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
        tmp = tar_path + ".tmp"
        with _tarfile.open(tmp, "w") as tf:
            for r in docs.itertuples():
                for ext, payload in (("txt", r.text.encode()), ("cls", r.lang.encode())):
                    info = _tarfile.TarInfo(name=f"doc-{r.doc_id:08d}.{ext}")
                    info.size = len(payload)
                    tf.addfile(info, _io.BytesIO(payload))
        os.rename(tmp, tar_path)

    from .builder import DefaultPipeline

    def finish(kind):
        def f(t: pa.Table) -> pa.Table:
            keys = t["__key__"].to_pylist()
            return pa.table(
                {
                    "kind": pa.array([kind] * len(t), pa.string()),
                    "doc_id": pa.array([int(k.split("-")[-1]) for k in keys], pa.int64()),
                    "n_bytes": pc.cast(pc.binary_length(t["txt"]), pa.int64()),
                    "lang": pc.cast(t["cls"], pa.string()),
                }
            )
        return f

    # kind-tagged union over BOTH reader tiers: 'greedy' = whole-archive
    # TarGreedyReader path; 'seek' = the bounded-memory two-pass
    # TarSeekReader path (streaming=True, seekreader.go:16-138) — the same
    # oracle rows must come out of each
    greedy = DefaultPipeline().from_tar(
        tar_path, members=["txt", "cls"]).collect().do().map_batches(
        finish("greedy"), batch_format="pyarrow")
    seek = DefaultPipeline().from_tar(
        tar_path, members=["txt", "cls"], streaming=True).collect().do().map_batches(
        finish("seek"), batch_format="pyarrow")

    # 'warc' leg: the crawl drop format through sources/warc.py
    from ..sources import warc as warcmod

    warc_path = f"/tmp/graft_warc/sf{walmod.sf_from_dir(sf_dir):g}.warc.gz"
    os.makedirs(os.path.dirname(warc_path), exist_ok=True)
    if not os.path.exists(warc_path):
        docs = pd.read_parquet(_t(sf_dir, "documents"),
                               columns=["doc_id", "text", "lang"])
        tmp = warc_path + f".tmp-{os.getpid()}"
        warcmod.write_warc(tmp, (
            {"warc_type": "response", "uri": f"https://docs/{r.doc_id}",
             "content_type": f"text/plain; lang={r.lang}",
             "payload": b"HTTP/1.1 200 OK\r\n\r\n" + r.text.encode()}
            for r in docs.itertuples()))
        os.rename(tmp, warc_path)

    def finish_warc(t: pa.Table) -> pa.Table:
        ids = [int(u.rsplit("/", 1)[-1]) for u in t["uri"].to_pylist()]
        langs = [ct.rsplit("lang=", 1)[-1] for ct in t["content_type"].to_pylist()]
        return pa.table({
            "kind": pa.array(["warc"] * len(t), pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "n_bytes": pc.cast(pc.binary_length(t["payload"]), pa.int64()),
            "lang": pa.array(langs, pa.string()),
        })

    wleg = warcmod.read_warc(warc_path).map_batches(
        finish_warc, batch_format="pyarrow")
    return greedy.union(seek).union(wleg)


def q_tfrecord_roundtrip(sf_dir: str):
    """TFRecord compat round-trip (the reference's native format,
    tfrecord.go:64-88/199-236): documents → TFRecord file (CRC32C framing)
    → read back. Lossless, so the ORIGINAL table is the oracle."""
    from .builder import DefaultPipeline

    path = f"/tmp/graft_tfrec/sf{walmod.sf_from_dir(sf_dir):g}.tfrecord"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    src = _read_docs(sf_dir, columns=["doc_id", "n_chars"])
    DefaultPipeline().from_dataset(src).to_tfrecord(path).do()
    out = DefaultPipeline().from_tfrecord(path).collect().do()

    def unwrap(t: pa.Table) -> pa.Table:
        # int64 scalars round-trip as single-element Int64Lists (the
        # reference's scalar representation, example.go:89-95) — flatten back
        cols = {}
        for c in ("doc_id", "n_chars"):
            col = t[c]
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                col = pc.list_flatten(col.combine_chunks())
            cols[c] = pc.cast(col, pa.int64())
        return pa.table(cols)

    return out.map_batches(unwrap, batch_format="pyarrow")


def q_training_pipeline(sf_dir: str):
    """Flagship composition — the full path a training-data user runs:
    CDC lake snapshot → quality filter (n_tok ≥ 8) → deterministic
    train split → context-length packing. Streams end to end; no stage
    materializes the corpus.

    Driver-checked via an ORDER-FREE CONTENT-MULTISET DIGEST of the packed
    output (packing layout is block-arrival-dependent; the content is not):
    n_docs (docs packed), content_tokens (non-pad positions = Σ n_tok + one
    EOD per doc), tok_sum / tok_sq (Σ t, Σ t² over non-pad positions —
    count+sum+sum-of-squares pins the token multiset). All four are
    SQL-closed-form over the replayed lake, so the whole CDC-replay →
    filter → split → pack chain is hash-checked end to end. Per-sequence
    layout/shape stays covered by ``tokenize_pack`` + the loader pytests."""
    from ..functions import pack

    eng = replayed_engine(sf_dir)
    ds = eng.scan()
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_tok"], 8)), batch_format="pyarrow"
    )

    def add_num(t: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64())
        return t.append_column("doc_num", num)

    ds = rel.assign_split(ds.map_batches(add_num, batch_format="pyarrow"), "doc_num")
    train = ds.map_batches(
        lambda t: t.filter(pc.equal(t["split"], pa.scalar("train"))),
        batch_format="pyarrow",
    )
    packed = pack.pack_sequences(train, context_len=256, eod_token=50256)

    def partial(t: pa.Table) -> pa.Table:
        toks = t["tokens"].combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        fill = t["fill_ratio"].to_numpy(zero_copy_only=False)
        n_docs = int(t["n_docs"].to_numpy(zero_copy_only=False).sum())
        # pad token is 0, so padded positions add 0 to both moments
        return pa.table({
            "n_docs": pa.array([n_docs], pa.int64()),
            "content_tokens": pa.array(
                [int(np.rint(fill.sum() * 256))], pa.int64()),
            "tok_sum": pa.array([int(flat.sum())], pa.int64()),
            "tok_sq": pa.array([int((flat * flat).sum())], pa.int64()),
        })

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({c: [np.int64(df[c].sum())]
                             for c in ("n_docs", "content_tokens",
                                       "tok_sum", "tok_sq")})

    return exchange_coalesce_map(
        packed.map_batches(partial, batch_format="pyarrow"), total
    )


# --------------------------------------------------------------------------
# training-data ops: text / dedup / ANN / multimodal
# --------------------------------------------------------------------------

def q_json_extract(sf_dir: str):
    """Semi-structured: pull the int field `k` out of the JSON props column
    (compiled-regex fast path + json.loads fallback, actor pool)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "props"])
    return text.json_extract(ds, "props", "k", out_type=pa.int64())


def q_text_features(sf_dir: str):
    """The whole per-doc text-analysis family in ONE single-pass stage
    (see ``text.TextFeaturizer``): doc stats + whitespace token count +
    quality raw features + language ID + whitespace-normalized MD5
    fingerprint, every column SQL-reproducible and hash-checked. The float
    quality ratios/score and the rolling-hash winnowing fingerprint stay
    pytest-covered (``text.quality`` / ``text.fingerprints``)."""
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    return text.text_features(ds)


_BPE_RX = r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+"


def q_tokenize(sf_dir: str):
    """Tokenization, stage-tagged union: 'hash' = the deterministic
    hash-vocab tokenizer (driver checks the SQL-reproducible (doc_id,
    n_tok) projection; the siphash-derived ids are pytest-verified for
    determinism/range); 'bpe' = a REAL byte-level BPE trained from
    scratch on a bounded deterministic sample of the same corpus
    (``functions/bpe.py``, 256 greedy merges, worker-cached merge table
    on apply) — every doc is encoded then decoded, the lossless property
    hard-asserted in-stage, and the reconstruction's character length
    emitted, which the oracle reproduces closed-form as
    ``length(array_to_string(regexp_extract_all(text, rx), ''))``."""
    from ..functions import bpe as bpemod
    from ..functions.text import _worker_cached

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])

    def tag(stage):
        def f(t: pa.Table) -> pa.Table:
            out = _i64(t.select(["doc_id", "n_tok"]), "doc_id", "n_tok")
            return out.add_column(0, "stage", pa.array([stage] * len(t)))
        return f

    hashed = text.tokenize(ds).map_batches(tag("hash"), batch_format="pyarrow")
    tok = bpemod.train_bpe(ds, n_merges=256, sample_n=512)
    bpe_leg = ds.map_batches(
        _worker_cached(bpemod.BPERoundTrip, tuple(tok.merges), "text",
                       "doc_id"),
        batch_format="pyarrow",
    ).map_batches(tag("bpe"), batch_format="pyarrow")
    return hashed.union(bpe_leg)


def q_tokenize_pack(sf_dir: str):
    """Full text→training-sequences pipeline: documents → tokenize
    (hash-vocab, list<int32>) → pack into 256-token sequences. Checked via
    exact token conservation (Σ pretokenizer pieces + one EOD per doc),
    which SQL reproduces with the same regex — layout-independent."""
    from ..functions import pack

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    toks = text.tokenize(ds)
    packed = pack.pack_sequences(toks, context_len=256, eod_token=50256)

    def partial(t: pa.Table) -> pa.Table:
        fill = t["fill_ratio"].to_numpy(zero_copy_only=False)
        return pa.table({"content_tokens": pa.array(
            [int(np.rint(fill.sum() * 256))], pa.int64())})

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"content_tokens": [np.int64(df["content_tokens"].sum())]})

    return exchange_coalesce_map(
        packed.map_batches(partial, batch_format="pyarrow"), total
    )


def q_dedup_exact(sf_dir: str):
    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    out = dedup.exact_dedup(ds, content_col="text", key_col="doc_id")
    return out.map_batches(lambda t: _i64(t, "doc_id", "n_copies"), batch_format="pyarrow")


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 for 4 fixed queries (vec_id < 4); returns
    the (query_id, vec_id) pairs — scores are float-ordering-sensitive so
    they stay out of the hash compare (checked with tolerance in pytest)."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    queries = pd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    queries = queries[queries["vec_id"] < 4]
    out = ann.brute_force_topk(ds, queries, k=10)
    return out.map_batches(
        lambda t: _i64(t.select(["query_id", "vec_id"]), "query_id", "vec_id"),
        batch_format="pyarrow",
    )


def _plant_doc_copies(ds, every: int = 50):
    """Plant EXACT copies of every ``every``-th document (doc_id + 1_000_000)
    — the same closed-form-ground-truth pattern as ``embedding_neardup``:
    identical text ⇒ identical signatures ⇒ guaranteed same LSH buckets, so
    recall for the planted set is exactly 1 and the expected output is
    SQL-closed-form (planted copies ∪ natural exact dups)."""

    def plant(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        copies = t.filter(pa.array(d % every == 0))
        copies = copies.set_column(
            copies.column_names.index("doc_id"), "doc_id",
            pc.add(copies["doc_id"], pa.scalar(1_000_000)),
        )
        return pa.concat_tables([t, copies])

    return ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)


def _disjoint_token_docs(sf_dir: str, n_words: int = 24):
    """Deterministic fixture corpus keyed to the documents table: doc i's
    text is ``w{i}x0 … w{i}x{n_words-1}`` — token sets (hence k-gram shingle
    sets) are PROVABLY disjoint across distinct docs, so any signature
    scheme gives inter-doc similarity exactly 0 (two disjoint shingle sets
    agree on a minhash component / simhash band only via a 64-bit hash
    collision). Natural text can't provide this: a real near-dup pair
    (Jaccard ≈ 0.97) passes a 0.5 signature threshold with P ≈ 0.14 per
    pair — deterministic for a fixed seed but not SQL-expressible. With
    disjointness, the ONLY near-dups are the planted exact copies, making
    the thresholded output SQL-closed-form."""
    docs = _read_docs(sf_dir, columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [" ".join(f"w{i}x{j}" for j in range(n_words)) for i in d]
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(synth, batch_format="pyarrow", zero_copy_batch=True)


def _plant_copies(ds, plan: list[tuple[int, int]]):
    """Plant exact copies per ``plan`` [(modulus, id_offset), ...]: every
    doc with doc_id % modulus == 0 gets a byte-identical copy at
    doc_id + id_offset. Identical text ⇒ identical signatures ⇒ the copy
    shares every LSH bucket with its original and matches it exactly —
    recall 1 by construction (the ``embedding_neardup`` pattern)."""

    def plant(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = [t]
        for every, off in plan:
            copies = t.filter(pa.array(d % every == 0))
            copies = copies.set_column(
                copies.column_names.index("doc_id"), "doc_id",
                pc.add(copies["doc_id"], pa.scalar(off)),
            )
            parts.append(copies)
        return pa.concat_tables(parts)

    return ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)


def q_minhash_batch(sf_dir: str):
    """MinHash-LSH near-dup (shingle→minhash→band→bucket→verify) over the
    disjoint-token fixture corpus + planted exact copies (every 50th doc →
    +1M; every 100th ALSO → +2M, exercising multi-copy groups): disjoint
    shingle sets make inter-doc signature similarity exactly 0, so the
    0.5-thresholded output is exactly the planted copies, each pointing at
    its group's min-id representative — SQL-closed-form. Behavior on
    natural text (recall/threshold monotonicity, Jaccard estimation error)
    stays pytest-covered (``test_dedup.py``). This is the bench-timed leg
    (``bench.py`` calls it directly so the timed number stays comparable
    across rounds); the registry entry is the legged composite below."""
    ds = _plant_copies(_disjoint_token_docs(sf_dir),
                       [(50, 1_000_000), (100, 2_000_000)])
    out = dedup.minhash_lsh_dedup(ds, threshold=0.5)
    return out.map_batches(
        lambda t: _i64(t.select(["doc_id", "dup_of"]), "doc_id", "dup_of"),
        batch_format="pyarrow",
    )


def _neardup_index_pairs(sf_dir: str) -> pa.Table:
    """Incremental near-dup INDEX leg: the same planted-copy plan as the
    batch leg, but reached through a 3-epoch CDC lake with a
    ``neardup_incremental`` run after each epoch — epoch 1 the originals
    (bootstrap, deletes nothing: disjoint token families), epoch 2 the +1M
    copies (each loses to its indexed incumbent), epoch 3 the +2M copies
    (each collides with its live original AND the now-dead +1M copy,
    exercising the stale-posting drop). The flagged (doc_id, dup_of) pairs
    equal the batch leg's closed-form oracle."""
    import shutil

    from ..cdc.engine import CDCEngine

    ids = pd.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id"])["doc_id"].to_numpy().astype(np.int64)
    NW = 24

    def tab(id_arr, src_arr):
        toks = [[int(i) * NW + j for j in range(NW)] for i in src_arr]
        return pa.table({
            "doc_id": pa.array([f"{i:09d}" for i in id_arr], pa.string()),
            "tokens": pa.array(toks, pa.list_(pa.int32())),
            "source": pa.array(["s"] * len(id_arr), pa.string()),
        })

    lake = os.path.join("/tmp/graft_lake",
                        f"neardupidx-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(lake, ignore_errors=True)
    eng = CDCEngine(lake, num_partitions=8)
    eng.upsert(tab(ids, ids))
    eng.neardup_incremental(content_col="tokens", num_shards=16, threshold=0.5)
    pairs = []
    for off, sel in ((1_000_000, ids[ids % 50 == 0]),
                     (2_000_000, ids[ids % 100 == 0])):
        eng.upsert(tab(sel + off, sel))
        out = eng.neardup_incremental(threshold=0.5, return_pairs=True)
        pairs.append(out["pairs"])
    t = pa.concat_tables(pairs)
    return pa.table({
        "leg": pa.array(["incr"] * t.num_rows, pa.string()),
        "doc_id": pc.cast(t["doc_id"], pa.int64()),
        "dup_of": pc.cast(t["dup_of"], pa.int64()),
    })


def q_minhash_dedup(sf_dir: str):
    """Kind-tagged near-dup composite over one closed-form planted oracle:
    leg='batch' = the full-corpus ``minhash_lsh_dedup`` sweep
    (``q_minhash_batch``), leg='incr' = the persisted incremental index
    (``cdc/neardupidx.py``) flagging the same copies epoch by epoch."""
    batch = q_minhash_batch(sf_dir).map_batches(
        lambda t: t.add_column(0, "leg", pa.array(["batch"] * len(t))),
        batch_format="pyarrow")
    return batch.union(rd.from_arrow(_neardup_index_pairs(sf_dir)))


def q_embedding_neardup(sf_dir: str):
    """Cosine near-dup over the embeddings table + PLANTED exact copies of
    every 50th vector (vec_id + 1_000_000) — the natural max pairwise cosine
    in the fixture is ~0.6, far below the 0.98 threshold, so the planted
    copies are exactly the expected output (recall is 1 for identical
    vectors: identical projections ⇒ identical sign buckets). This makes the
    query oracle-checkable; scores stay float-free in the compare."""
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        copies = t.filter(pa.array(v % 50 == 0))
        copies = copies.set_column(
            copies.column_names.index("vec_id"), "vec_id",
            pc.add(copies["vec_id"], pa.scalar(1_000_000)),
        )
        return pa.concat_tables([t, copies])

    planted = ds.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    out = dedup.embedding_neardup(planted, threshold=0.98)
    return out.map_batches(
        lambda t: _i64(t.select(["vec_id", "dup_of"]), "vec_id", "dup_of"),
        batch_format="pyarrow",
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (``functions/decontaminate.py``): docs
    with ``doc_id % 97 == 0`` play the held-out benchmark; their word
    3-gram hashes compress into ONE broadcast filter (exact sorted-array
    mode here; the Bloom mode is pytest-covered for parity), and the
    remaining corpus streams through a single flag pass — per-batch
    vectorized rolling n-gram hashing, no shuffle, nothing
    train-proportional on the driver. Returns (doc_id, n_hits) for every
    contaminated train doc, n_hits = count of DISTINCT overlapping
    3-grams — SQL-reproducible closed-form."""
    from ..functions import decontaminate as decon

    N = 3

    def split(keep_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0
            return t.filter(pa.array(m if keep_eval else ~m))
        return f

    ev = _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        split(True), batch_format="pyarrow", zero_copy_batch=True)
    train = _read_docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        split(False), batch_format="pyarrow", zero_copy_batch=True)
    filt = decon.build_eval_filter(ev, n=N)
    out = decon.flag_contamination(train, filt)
    return out.map_batches(
        lambda t: _i64(
            t.filter(t["contaminated"]).select(["doc_id", "n_hits"]),
            "doc_id", "n_hits"),
        batch_format="pyarrow",
    )


def q_simhash_neardup(sf_dir: str):
    """Hamming-banded SimHash near-dup (4×16-bit bands, full-signature
    Hamming verify ≤ 3) over the disjoint-token fixture corpus + planted
    exact copies (every 40th doc → +1M): disjoint token sets make distinct
    docs' signatures independent uniform 64-bit values (P(Hamming ≤ 3)
    ≈ 2.4e-15 per pair — band collisions occur but the full-signature
    verify rejects them), so the output is exactly the planted copies at
    Hamming 0 — SQL-closed-form. Natural-text behavior (bit-flip Hamming
    fixtures, exact-match grouping) stays pytest-covered. A natural-text
    pair differing by 1 of ~60 tokens can leave all 64 majority votes
    unchanged (measured at sf0.01), which is why the natural corpus can't
    be the driver fixture."""
    ds = _plant_copies(_disjoint_token_docs(sf_dir), [(40, 1_000_000)])
    out = dedup.simhash_banded_neardup(ds, max_hamming=3)
    return out.map_batches(
        lambda t: _i64(t.select(["doc_id", "dup_of", "hamming"]),
                       "doc_id", "dup_of", "hamming"),
        batch_format="pyarrow",
    )


def q_dedup_clusters_planted(sf_dir: str):
    """Connected-components clustering over a DETERMINISTIC planted pair
    set (chains (d, d-1) for d % 5 ≠ 0 ⇒ clusters of 5 consecutive ids with
    min-id representative) — oracle-checks the union-find contraction that
    dedup_clusters applies to LSH pairs."""
    docs = _read_docs(sf_dir, columns=["doc_id"])

    def mk_pairs(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d % 5 != 0
        return pa.table({"doc_id": pa.array(d[keep], pa.int64()),
                         "dup_of": pa.array(d[keep] - 1, pa.int64())})

    pairs = docs.map_batches(mk_pairs, batch_format="pyarrow", zero_copy_batch=True)
    out = dedup.cluster_duplicates(pairs)
    return out.map_batches(lambda t: _i64(t, "doc_id", "cluster"), batch_format="pyarrow")


def _span_fixture(sf_dir: str, n_words: int = 24):
    """Closed-form fixture for exact-substring dedup, keyed to documents:
    per doc i the disjoint-token text ``w{i}x0 … w{i}x23``; every 50th doc
    a FULL copy at +1M (every window duplicated ⇒ loser fully cut ⇒ '');
    every 100th doc a PARTIAL at +2M — 4 unique prefix words + words 5..14
    of doc i + 4 unique suffix words (run length 10 ≥ k=8, pre/suffix
    shorter than k so only run-internal windows duplicate ⇒ exactly the
    run is cut, leaving prefix + two spaces + suffix). Winner = min
    (doc_id, pos) ⇒ originals untouched. All three expected texts are
    SQL-constructible from doc_id alone."""
    docs = _read_docs(sf_dir, columns=["doc_id"])

    def synth(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids, texts = [], []
        for i in d:
            i = int(i)
            w = [f"w{i}x{j}" for j in range(n_words)]
            ids.append(i)
            texts.append(" ".join(w))
            if i % 50 == 0:
                ids.append(i + 1_000_000)
                texts.append(" ".join(w))
            if i % 100 == 0:
                ids.append(i + 2_000_000)
                texts.append(" ".join(
                    [f"p{i}a{j}" for j in range(4)] + w[5:15]
                    + [f"s{i}b{j}" for j in range(4)]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return docs.map_batches(synth, batch_format="pyarrow",
                            zero_copy_batch=True)


def q_ngram_dedup(sf_dir: str):
    """Kind-tagged dedup composite, leg ∈ {pairs, span}:

    leg='pairs' — exact word-k-gram Jaccard dedup at threshold 1.0 over
    documents + planted exact copies: LSH candidates (signature threshold
    1.0) verified with the exact distributed k-gram hash-set Jaccard, so
    the output is exactly the docs whose token sequence matches an
    earlier doc (``val`` = dup_of). Sub-1.0 thresholds stay
    pytest-covered.

    leg='span' — exact-substring (ExactSubstr) SPAN dedup
    (``functions/spandedup.py``) over the ``_span_fixture`` corpus:
    ``val`` = the rewritten post-cut text, byte-exact against the
    closed-form SQL expectation (originals unchanged, full copies cut to
    '', partials cut to prefix + '  ' + suffix). Brute-force parity,
    large-mode paths and Bloom floods stay pytest-covered
    (tests/test_spandedup.py)."""
    from ..functions import spandedup

    ds = _read_docs(sf_dir, columns=["doc_id", "text"])
    out = dedup.ngram_verified_dedup(_plant_doc_copies(ds), threshold=1.0,
                                     candidate_margin=1.0)
    pairs = out.map_batches(
        lambda t: pa.table({
            "leg": pa.array(["pairs"] * len(t)),
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "val": pc.cast(pc.cast(t["dup_of"], pa.int64()), pa.string()),
        }),
        batch_format="pyarrow",
    )
    cut = spandedup.exact_substring_dedup(
        _span_fixture(sf_dir), k=8, num_shards=16)
    span = cut.map_batches(
        lambda t: pa.table({
            "leg": pa.array(["span"] * len(t)),
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "val": t["text"],
        }),
        batch_format="pyarrow",
    )
    return pairs.union(span)


def q_ann_ivf_full(sf_dir: str):
    """ANN kind-tagged composite: 'scan' = in-scan IVF at FULL probe
    (``ann.ivf_topk`` — routing during a corpus scan); 'persisted' = the
    persisted inverted-list index (``functions/annidx.py``) built into a
    scratch dir, then queried by reading only probed fragments; 'lsh' =
    multi-probe hyperplane LSH (``ann.lsh_topk``) over a PLANTED corpus
    (exact copies of every 50th vector at vec_id + 1_000_000 — an
    identical vector lands in its query's own bucket with cosine 1.0, so
    each planted query's top-1 is provably its copy). Full probe makes
    the first two provably exact (one brute-force DuckDB oracle under
    both tags); the lsh leg's oracle is the closed-form planted answer.
    Partial-probe approximation, LSH recall curves and the
    fragments-read bound stay covered by pytest."""
    import shutil
    import tempfile

    from ..functions import annidx

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    queries = pd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    queries = queries[queries["vec_id"] < 4]

    def keyed(out, kind: str) -> pa.Table:
        t = pa.concat_tables(
            b for b in out.map_batches(
                lambda t: _i64(t.select(["query_id", "vec_id"]),
                               "query_id", "vec_id"),
                batch_format="pyarrow",
            ).iter_batches(batch_format="pyarrow")
        )
        return t.add_column(0, "kind", pa.array([kind] * len(t)))

    scan = keyed(ann.ivf_topk(ds, queries, k=10, n_centroids=16, n_probe=16),
                 "scan")
    idx_dir = tempfile.mkdtemp(prefix="graft_annidx_")
    try:
        shutil.rmtree(idx_dir)  # build requires a fresh dir
        annidx.build_ann_index(ds, idx_dir, n_centroids=16)
        pers = keyed(annidx.query_ann_index(idx_dir, queries, k=10, n_probe=16),
                     "persisted")
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)

    # 'lsh' leg: planted exact copies, top-1 per planted query
    def plant(t: pa.Table) -> pa.Table:
        v = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        copies = t.filter(pa.array(v % 50 == 0))
        copies = copies.set_column(
            copies.column_names.index("vec_id"), "vec_id",
            pc.add(copies["vec_id"], pa.scalar(1_000_000)),
        )
        return pa.concat_tables([t, copies])

    planted = ds.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    lsh_q = pd.read_parquet(_t(sf_dir, "embeddings"),
                            columns=["vec_id", "embedding"])
    lsh_q = lsh_q[lsh_q["vec_id"] % 50 == 0]
    lsh = keyed(ann.lsh_topk(planted, lsh_q, k=1), "lsh")
    return pa.concat_tables([scan, pers, lsh])


def q_media_decode(sf_dir: str):
    """Multimodal image pipeline, stage-tagged union: 'decode' = REAL PNG
    decode (pure zlib+numpy codec) of the synthetic payloads, emitting the
    decoded dimensions (closed-form: w = h = 64 + (i%4)·32); 'resize' =
    decode → nearest-neighbor resample to 32×32 → PNG re-encode → decode
    again, emitting the resized dimensions; 'jpeg' = REAL baseline JPEG
    decode (from-spec ITU-T T.81 codec, ``functions/jpeg.py``, alternating
    4:4:4/4:2:0 payloads) emitting the decoded dimensions. Dimensions are
    recovered from the PIXELS after a full encode/decode round trip, so
    all codec directions are hash-checked; pixel-level content equality
    (PSNR for the lossy JPEG path) stays in the codec round-trip pytests
    (float feature vectors are excluded from the driver compare)."""
    from ..functions import multimodal

    n = max(int(1000 * walmod.sf_from_dir(sf_dir) * 10), 50)

    def dims(stage):
        def f(t: pa.Table) -> pa.Table:
            out = t.select(["media_id", "width", "height"])
            out = _i64(out, "width", "height")
            return out.add_column(0, "stage", pa.array([stage] * len(t)))
        return f

    ds1 = rd.from_arrow(multimodal.synth_media_table(n, payload="png"))
    decoded = multimodal.decode_images(ds1, mode="real").map_batches(
        dims("decode"), batch_format="pyarrow")
    ds2 = rd.from_arrow(multimodal.synth_media_table(n, payload="png"))
    resized = multimodal.decode_images(
        multimodal.resize_images(ds2, 32, 32, mode="real"), mode="real"
    ).map_batches(dims("resize"), batch_format="pyarrow")
    ds3 = rd.from_arrow(multimodal.synth_media_table(n, payload="jpeg"))
    jpeg_decoded = multimodal.decode_images(ds3, mode="real").map_batches(
        dims("jpeg"), batch_format="pyarrow")
    return decoded.union(resized).union(jpeg_decoded)


def q_media_frames(sf_dir: str):
    """REAL frame sampling over six video formats / eight layouts
    (flat-map shape: one row per sampled frame index), stage-tagged
    union: 'gif' = each
    clip is a true (i%30)+1-frame GIF89a animation decoded from-spec (LZW
    + disposal composition, ``functions/gif.py``); 'mjpeg' = the same
    clips as Motion-JPEG streams (concatenated baseline JPEGs), frame
    boundaries recovered by the exact marker-segment walk in
    ``codecs.split_mjpeg``; 'avi' = the same clips as MJPEG-in-AVI (RIFF
    container, ``functions/avi.py``), frames counted via the idx1 seek
    index / movi chunk walk; 'mp4' = the same clips as MJPEG-in-MP4
    (ISO-BMFF, ``functions/mp4.py``), frames counted from the mandatory
    stsz/stsc/stco sample tables without touching mdat; 'fmp4' = the
    same clips in the fragmented/DASH layout, frames counted from the
    moof/tfhd/trun fragment runs; 'mkv' = the same clips as
    MJPEG-in-Matroska (EBML container, ``functions/mkv.py``, lacing
    mode cycling none/Xiph/EBML per clip), frames counted from the
    O(block headers) cluster walk. Sampled indices
    come from the DECODED container in all legs, so the oracle's
    closed-form reconstruction hash-checks every round trip.
    Pixel-content equality of decoded frames stays in the codec
    pytests."""
    from ..functions import multimodal

    def tag(stage):
        def f(t: pa.Table) -> pa.Table:
            t = _i64(t, "frame_idx")
            return t.add_column(0, "stage", pa.array([stage] * len(t)))
        return f

    n = max(int(1000 * walmod.sf_from_dir(sf_dir) * 10), 50)
    gif = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="gif"))
    gif_out = multimodal.sample_frames(gif, every_n=10, mode="real").map_batches(
        tag("gif"), batch_format="pyarrow")
    mjp = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mjpeg"))
    mjp_out = multimodal.sample_frames(mjp, every_n=10, mode="real").map_batches(
        tag("mjpeg"), batch_format="pyarrow")
    av = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="avi"))
    avi_out = multimodal.sample_frames(av, every_n=10, mode="real").map_batches(
        tag("avi"), batch_format="pyarrow")
    mp = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mp4"))
    mp4_out = multimodal.sample_frames(mp, every_n=10, mode="real").map_batches(
        tag("mp4"), batch_format="pyarrow")
    fmp = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="fmp4"))
    fmp4_out = multimodal.sample_frames(fmp, every_n=10, mode="real").map_batches(
        tag("fmp4"), batch_format="pyarrow")
    mk = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mkv"))
    mkv_out = multimodal.sample_frames(mk, every_n=10, mode="real").map_batches(
        tag("mkv"), batch_format="pyarrow")
    # 'mpeg' / 'mpegps' / 'mpegts' = the same clips as MPEG-1 video
    # (from-spec ISO 11172-2 codec with I/P/B GOP shapes cycling,
    # ``functions/mpeg.py``), frames counted by the exact
    # picture-start-code scan — the elementary-stream leg, the
    # ISO 11172-1 program-stream (PES demux) leg, and the ISO 13818-1
    # transport-stream (188-byte packets, PAT/PMT, PES reassembly) leg
    mpg = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mpeg"))
    mpg_out = multimodal.sample_frames(mpg, every_n=10, mode="real").map_batches(
        tag("mpeg"), batch_format="pyarrow")
    mps = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mpegps"))
    mps_out = multimodal.sample_frames(mps, every_n=10, mode="real").map_batches(
        tag("mpegps"), batch_format="pyarrow")
    mts = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="video", payload="mpegts"))
    mts_out = multimodal.sample_frames(mts, every_n=10, mode="real").map_batches(
        tag("mpegts"), batch_format="pyarrow")
    return (gif_out.union(mjp_out).union(avi_out).union(mp4_out)
            .union(fmp4_out).union(mkv_out).union(mpg_out).union(mps_out)
            .union(mts_out))


def q_audio_features(sf_dir: str):
    """REAL WAV decode → per-window RMS features, stage-tagged union:
    'pcm' = RIFF header + int16 PCM via the ``wave`` module; 'adpcm' =
    the same clips compressed ~3.5:1 as IMA ADPCM (fmt tag 0x0011,
    from-spec block decode vectorized across blocks, block_align cycling
    64/128/256, final-block padding trimmed by the ``fact`` chunk);
    'ulaw' / 'alaw' = the same clips as 8-bit G.711 (fmt tags
    0x0007/0x0006, exact 2:1, pure-numpy bit kernels with the
    fixed-point property pytest-verified over all 256 codes).
    The driver hash-checks the header/sample-count round trip
    (sample_rate parsed from RIFF, n_samples = decoded mono length —
    both closed-form for the synthetic clips, identical across codecs
    BECAUSE the fact-chunk trim is exact); the float RMS values (lossy
    on the compressed legs) are pytest-covered."""
    from ..functions import multimodal

    def tag(stage):
        def f(t: pa.Table) -> pa.Table:
            out = _i64(t.select(["media_id", "sample_rate", "n_samples"]),
                       "sample_rate", "n_samples")
            return out.add_column(0, "stage", pa.array([stage] * len(t)))
        return f

    n = max(int(1000 * walmod.sf_from_dir(sf_dir) * 10), 50)
    ds = rd.from_arrow(multimodal.synth_media_table(n, media_type="audio", payload="wav"))
    pcm = multimodal.audio_features(ds, n_windows=4, mode="real").map_batches(
        tag("pcm"), batch_format="pyarrow")
    ds2 = rd.from_arrow(multimodal.synth_media_table(
        n, media_type="audio", payload="wav_adpcm"))
    adpcm = multimodal.audio_features(ds2, n_windows=4, mode="real").map_batches(
        tag("adpcm"), batch_format="pyarrow")
    out = pcm.union(adpcm)
    for law in ("ulaw", "alaw"):
        dsl = rd.from_arrow(multimodal.synth_media_table(
            n, media_type="audio", payload=f"wav_{law}"))
        out = out.union(multimodal.audio_features(
            dsl, n_windows=4, mode="real").map_batches(
                tag(law), batch_format="pyarrow"))
    return out


# --------------------------------------------------------------------------
# registry + oracle SQL
# --------------------------------------------------------------------------

QUERIES = {
    # §2.2-2.4 reference transform surface
    "select_selections": q_select_selections,
    "predicate_keyvalue": q_predicate_keyvalue,
    "udf_revenue": q_udf_revenue,
    "coerce_widen": q_coerce_widen,
    "pipeline_chain": q_pipeline_chain,
    # relational / wide operators
    "agg_pricing": q_agg_pricing,
    "rollup_pricing": q_rollup_pricing,
    "distinct": q_distinct,
    "window_hourly": q_window_hourly,
    "window_sliding": q_window_sliding,
    "explode_embeddings": q_explode_embeddings,
    "inverted_index": q_inverted_index,
    "topk_orders": q_topk_orders,
    "split_assign": q_split_assign,
    "sessionize": q_sessionize,
    "rolling_value": q_rolling_value,
    "quantiles_grouped": q_quantiles_grouped,
    "sampling_chain": q_sampling_chain,
    # joins
    "join_broadcast": q_join_broadcast,
    "join_bucketed": q_join_bucketed,
    "join_storage": q_join_storage,
    "join_semi_anti": q_join_semi_anti,
    "join_semi_bloom": q_join_semi_bloom,
    "join_outer": q_join_outer,
    "join_asof": q_join_asof,
    "join_range": q_join_range,
    "join_range_bins": q_join_range_bins,
    # CDC (the north rule)
    "cdc_replay_digest": q_cdc_replay_digest,
    "cdc_changes_digest": q_cdc_changes_digest,
    "cdc_rollups": q_cdc_rollups,
    # end-to-end pipelines
    "training_pipeline": q_training_pipeline,
    "tar_pipeline": q_tar_pipeline,
    "tfrecord_roundtrip": q_tfrecord_roundtrip,
    # text analysis
    "json_extract": q_json_extract,
    "text_features": q_text_features,
    "tokenize": q_tokenize,
    "tokenize_pack": q_tokenize_pack,
    # dedup
    "dedup_exact": q_dedup_exact,
    "minhash_dedup": q_minhash_dedup,
    "simhash_neardup": q_simhash_neardup,
    "ngram_dedup": q_ngram_dedup,
    "embedding_neardup": q_embedding_neardup,
    "dedup_clusters_planted": q_dedup_clusters_planted,
    # ANN
    "ann_topk": q_ann_topk,
    "ann_ivf_full": q_ann_ivf_full,
    "decontaminate": q_decontaminate,
    # sketches
    "approx_ndv": q_approx_ndv,
    # multimodal
    "media_decode": q_media_decode,
    "media_frames": q_media_frames,
    "audio_features": q_audio_features,
}

# The driver runs the oracle at sf=0.01; the CDC oracles read the
# deterministically generated sf0.01 WAL from its fixed path.
_WAL_GLOB_001 = "/tmp/graft_wal/sf0.01-v1/epoch-*/shard-*.parquet"

_CDC_LAST = f"""
WITH w AS (SELECT * FROM read_parquet('{_WAL_GLOB_001}')),
last AS (
  SELECT * FROM w
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY seq DESC) = 1
)
"""

_DIGEST_COLS = (
    "doc_id, CAST(n_tok AS BIGINT) AS n_tok, source, "
    "CAST(list_sum(tokens) AS BIGINT) AS tok_sum, "
    "CAST(tokens[1] AS BIGINT) AS tok_first, "
    "CAST(tokens[-1] AS BIGINT) AS tok_last"
)

# doc-text normalizations for the planted-dedup oracles: the engines'
# tokenization is lower().split(), i.e. \s+ splitting with empties dropped
_NORM_SEQ = ("array_to_string(list_filter(string_split_regex(lower(text), "
             "'\\s+'), x -> x <> ''), ' ')")
def _planted_dup_sql(norm_expr: str) -> str:
    """Expected (doc_id, dup_of) of a signature-equality dedup over
    documents + planted copies (every 50th doc, id + 1_000_000): each doc
    whose normalized text matches an earlier doc points at its group's
    min-id representative."""
    return (
        f"WITH d AS (SELECT doc_id, {norm_expr} AS nrm FROM documents), "
        "grp AS (SELECT nrm, MIN(doc_id) AS rep FROM d GROUP BY nrm), "
        "nat AS (SELECT d.doc_id AS doc_id, g.rep AS dup_of FROM d "
        "  JOIN grp g ON d.nrm = g.nrm WHERE d.doc_id > g.rep), "
        "pl AS (SELECT d.doc_id + 1000000 AS doc_id, g.rep AS dup_of FROM d "
        "  JOIN grp g ON d.nrm = g.nrm WHERE d.doc_id % 50 = 0) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(dup_of AS BIGINT) AS dup_of "
        "FROM nat UNION ALL SELECT CAST(doc_id AS BIGINT), CAST(dup_of AS BIGINT) FROM pl"
    )


ORACLE_SQL = {
    "select_selections": (
        "SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus FROM lineitem"
    ),
    "predicate_keyvalue": "SELECT event_id, event_type FROM events WHERE event_type = 'click'",
    "udf_revenue": (
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, "
        "l_extendedprice * (1 - l_discount) AS revenue FROM lineitem"
    ),
    "coerce_widen": (
        "SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS linenumber64 FROM lineitem"
    ),
    "pipeline_chain": (
        "SELECT event_id, value, event_type AS etype FROM events "
        "WHERE event_type = 'purchase'"
    ),
    "agg_pricing": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
        "CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * "
        "         CAST(ROUND((1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c4, "
        "CAST(COUNT(*) AS BIGINT) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "rollup_pricing": (
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
    ),
    "distinct": "SELECT DISTINCT event_type FROM events",
    "window_hourly": (
        "SELECT user_id, CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM events GROUP BY 1, 2"
    ),
    "window_sliding": (
        "SELECT CAST(floor(epoch(ts)/900)*900 - o*900 AS BIGINT) AS window_start, "
        "CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS o) t GROUP BY 1"
    ),
    "explode_embeddings": (
        "SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS value FROM embeddings"
    ),
    "inverted_index": (
        "WITH t AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), "
        "'[a-z]+')) AS token FROM documents) "
        "SELECT 'postings' AS kind, token, "
        "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS payload "
        "FROM t GROUP BY token "
        "UNION ALL "
        "(SELECT 'hh' AS kind, token, CAST(COUNT(*) AS VARCHAR) AS payload "
        " FROM t GROUP BY token ORDER BY COUNT(*) DESC, token LIMIT 20) "
        "UNION ALL "
        "SELECT 'expect' AS kind, 'min_len:text:200' AS token, "
        "CAST(COUNT(*) - COUNT(CASE WHEN length(text) >= 200 THEN 1 END) "
        "AS VARCHAR) AS payload FROM documents "
        "UNION ALL "
        "SELECT 'expect' AS kind, 'max_len:text:2000' AS token, "
        "CAST(COUNT(*) - COUNT(CASE WHEN length(text) <= 2000 THEN 1 END) "
        "AS VARCHAR) AS payload FROM documents "
        "UNION ALL "
        "SELECT 'expect' AS kind, 'matches:text' AS token, "
        "CAST(COUNT(*) - COUNT(CASE WHEN regexp_matches(text, '[0-9]') "
        "THEN 1 END) AS VARCHAR) AS payload FROM documents"
    ),
    "topk_orders": (
        "(SELECT 'global' AS kind, o_orderkey, o_orderpriority, o_totalprice "
        " FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10) "
        "UNION ALL "
        "(SELECT 'group' AS kind, o_orderkey, o_orderpriority, o_totalprice "
        " FROM orders QUALIFY row_number() OVER (PARTITION BY o_orderpriority "
        " ORDER BY o_totalprice DESC, o_orderkey) <= 2)"
    ),
    "split_assign": (
        "SELECT doc_id, CASE WHEN doc_id % 10 < 8 THEN 'train' "
        "WHEN doc_id % 10 < 9 THEN 'val' ELSE 'test' END AS split FROM documents"
    ),
    "sessionize": (
        "WITH x AS (SELECT user_id, ts, event_id, "
        "  CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 OR "
        "       lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s FROM events "
        "  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "y AS (SELECT user_id, SUM(new_s) OVER "
        "  (PARTITION BY user_id ORDER BY ts, event_id "
        "   ROWS UNBOUNDED PRECEDING) AS session_id FROM x) "
        "SELECT user_id, CAST(session_id AS BIGINT) AS session_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM y GROUP BY 1, 2"
    ),
    "rolling_value": (
        "SELECT event_id, user_id, CAST(SUM(CAST(floor(value*100) AS BIGINT)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents FROM events"
    ),
    "quantiles_grouped": (
        "SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS p50, "
        "quantile_disc(o_totalprice, 0.95) AS p95 FROM orders "
        "GROUP BY o_orderpriority"
    ),
    "sampling_chain": (
        "SELECT o_orderkey, o_orderpriority FROM orders "
        "WHERE o_orderkey % 20 = 0 "
        "QUALIFY row_number() OVER (PARTITION BY o_orderpriority "
        "ORDER BY (o_orderkey * 2654435761) % 4294967296, o_orderkey) <= 3"
    ),
    "join_broadcast": (
        "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_nationkey"
    ),
    "join_bucketed": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    ),
    "join_storage": (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    ),
    "join_semi_anti": (
        "SELECT 'semi' AS kind, c_custkey, c_name FROM customer c "
        "WHERE EXISTS (SELECT 1 FROM orders o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) "
        "UNION ALL "
        "SELECT 'anti' AS kind, c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"
    ),
    "join_semi_bloom": (
        "SELECT c_custkey, c_name FROM customer c WHERE EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)"
    ),
    "join_outer": (
        "WITH cu AS (SELECT c_custkey, c_name FROM customer WHERE c_nationkey < 10), "
        "big AS (SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_big "
        "  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey) "
        "SELECT COALESCE(cu.c_custkey, big.c_custkey) AS c_custkey, "
        "COALESCE(cu.c_name, '') AS c_name, COALESCE(big.n_big, -1) AS n_big "
        "FROM cu FULL OUTER JOIN big ON cu.c_custkey = big.c_custkey"
    ),
    "join_asof": (
        "WITH pur AS (SELECT user_id, ts, MAX(event_id) AS pid FROM events "
        "  WHERE event_type = 'purchase' GROUP BY user_id, ts) "
        "SELECT e.event_id, COALESCE(p.pid, -1) AS prev_purchase "
        "FROM events e ASOF LEFT JOIN pur p "
        "  ON e.user_id = p.user_id AND p.ts < e.ts"
    ),
    "join_range": (
        "WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events "
        "  WHERE event_type = 'purchase') "
        "SELECT p.purchase_id, CAST(COUNT(*) AS BIGINT) AS n_events "
        "FROM p JOIN events e ON e.user_id = p.user_id "
        "  AND e.ts BETWEEN p.ts AND p.ts + INTERVAL 30 MINUTE "
        "GROUP BY p.purchase_id"
    ),
    "join_range_bins": (
        "SELECT CAST(p_partkey AS BIGINT) AS p_partkey, "
        "CAST(n_nationkey AS BIGINT) AS n_nationkey FROM part, nation "
        "WHERE p_retailprice BETWEEN n_nationkey*200 AND n_nationkey*200 + 150"
    ),
    "cdc_replay_digest": _CDC_LAST + (
        f"SELECT 'replay' AS stage, {_DIGEST_COLS} FROM last WHERE op <> 'D' "
        "UNION ALL "
        f"SELECT 'compacted' AS stage, {_DIGEST_COLS} FROM last WHERE op <> 'D' "
        "UNION ALL "
        f"SELECT 'resharded' AS stage, {_DIGEST_COLS} FROM last WHERE op <> 'D' "
        "UNION ALL "
        f"SELECT 'replicated' AS stage, {_DIGEST_COLS} FROM last WHERE op <> 'D'"
    ),
    "cdc_changes_digest": (
        f"WITH w AS (SELECT * FROM read_parquet('{_WAL_GLOB_001}')), "
        "ch AS (SELECT * FROM w WHERE epoch > (SELECT MIN(epoch) FROM w)), "
        "net AS (SELECT * FROM ch QUALIFY row_number() OVER "
        "  (PARTITION BY doc_id ORDER BY epoch DESC, seq DESC) = 1) "
        "SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, source, "
        "CAST(COALESCE(list_sum(tokens), 0) AS BIGINT) AS tok_sum, "
        "CAST(COALESCE(tokens[1], 0) AS BIGINT) AS tok_first, "
        "CAST(COALESCE(tokens[-1], 0) AS BIGINT) AS tok_last, "
        "op, CAST(seq AS BIGINT) AS seq "
        "FROM net"
    ),
    "training_pipeline": _CDC_LAST + (
        # packed-content multiset digest over the live lake rows that pass
        # the quality filter (n_tok >= 8) and the train split
        # (doc_num % 10 < 8): one EOD (50256) is appended per doc, padding
        # is token 0 (adds nothing to any moment)
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tok) + COUNT(*) AS BIGINT) AS content_tokens, "
        "CAST(SUM(list_sum(tokens)) + COUNT(*) * 50256 AS BIGINT) AS tok_sum, "
        "CAST(SUM(list_sum(list_transform(tokens, "
        "x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))) "
        "+ COUNT(*) * (CAST(50256 AS BIGINT) * 50256) AS BIGINT) AS tok_sq "
        "FROM last WHERE op <> 'D' AND n_tok >= 8 "
        "AND CAST(substr(doc_id, 5) AS BIGINT) % 10 < 8"
    ),
    "cdc_rollups": _CDC_LAST + (
        "SELECT 'scan' AS kind, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tok) AS BIGINT) AS total_tokens "
        "FROM last WHERE op <> 'D' GROUP BY source "
        "UNION ALL "
        "SELECT 'incr' AS kind, source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(n_tok) AS BIGINT) AS total_tokens "
        "FROM last WHERE op <> 'D' GROUP BY source"
    ),
    "tar_pipeline": (
        "SELECT 'greedy' AS kind, doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, lang FROM documents "
        "UNION ALL "
        "SELECT 'seek' AS kind, doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, lang FROM documents "
        "UNION ALL "
        "SELECT 'warc' AS kind, doc_id, "
        "CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, lang FROM documents"
    ),
    "tfrecord_roundtrip": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars "
        "FROM documents"
    ),
    "json_extract": (
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events"
    ),
    "text_features": (
        r"WITH c AS (SELECT doc_id, text, "
        r"len(regexp_extract_all(lower(text), '\b(?:der|und|die|nicht|ist|das)\b')) AS de, "
        r"len(regexp_extract_all(lower(text), '\b(?:the|and|of|is|with|for)\b')) AS en, "
        r"len(regexp_extract_all(lower(text), '\b(?:el|la|los|que|es|una)\b')) AS es, "
        r"len(regexp_extract_all(lower(text), '\b(?:le|la|et|les|des|est)\b')) AS fr "
        r"FROM documents) "
        r"SELECT doc_id, "
        r"CAST(length(text) AS BIGINT) AS n_chars, "
        r"CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces, "
        r"CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct, "
        r"CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens, "
        r"CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_words, "
        r"CAST(len(regexp_extract_all(lower(text), "
        r"'\b(?:the|a|of|and|to|in|is|for)\b')) AS BIGINT) AS n_stop, "
        r"CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und' "
        r"WHEN de >= en AND de >= es AND de >= fr THEN 'de' "
        r"WHEN en >= es AND en >= fr THEN 'en' "
        r"WHEN es >= fr THEN 'es' ELSE 'fr' END AS lang_pred, "
        r"md5(array_to_string(list_filter(string_split_regex(text, '\s+'), "
        r"x -> x <> ''), ' ')) AS fp_md5 "
        r"FROM c"
    ),
    "tokenize": (
        # 'hash' = pretoken count; 'bpe' = character length of the BPE
        # round-trip reconstruction == concatenated pretokens (lossless)
        r"SELECT 'hash' AS stage, doc_id, CAST(len(regexp_extract_all(text, "
        r"'[A-Za-z]+|\d+|[^\sA-Za-z\d]+')) AS BIGINT) AS n_tok FROM documents "
        r"UNION ALL SELECT 'bpe' AS stage, doc_id, "
        r"CAST(length(array_to_string(regexp_extract_all(text, "
        r"'[A-Za-z]+|\d+|[^\sA-Za-z\d]+'), '')) AS BIGINT) AS n_tok "
        r"FROM documents"
    ),
    "tokenize_pack": (
        r"SELECT CAST(SUM(len(regexp_extract_all(text, "
        r"'[A-Za-z]+|\d+|[^\sA-Za-z\d]+'))) + COUNT(*) AS BIGINT) "
        r"AS content_tokens FROM documents"
    ),
    "dedup_exact": (
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies "
        "FROM documents GROUP BY text"
    ),
    "ngram_dedup": (
        # leg='pairs': the planted-copy dup pairs (val = dup_of);
        # leg='span': the _span_fixture corpus post-cut — originals keep
        # their synthesized text, full copies (+1M, every 50th) cut to '',
        # partials (+2M, every 100th) keep prefix + '  ' + suffix (the
        # 10-word run is removed character-accurately)
        "WITH pairsleg AS (" + _planted_dup_sql(_NORM_SEQ) + "), "
        "ids AS (SELECT CAST(doc_id AS BIGINT) AS i FROM documents), "
        "spanleg AS ("
        "SELECT i AS doc_id, array_to_string("
        "  [printf('w%dx%d', i, j) for j in range(0, 24)], ' ') AS val "
        "FROM ids "
        "UNION ALL SELECT i + 1000000, '' FROM ids WHERE i % 50 = 0 "
        "UNION ALL SELECT i + 2000000, "
        "  array_to_string([printf('p%da%d', i, j) for j in range(0, 4)], ' ')"
        "  || '  ' || "
        "  array_to_string([printf('s%db%d', i, j) for j in range(0, 4)], ' ')"
        " FROM ids WHERE i % 100 = 0) "
        "SELECT 'pairs' AS leg, doc_id, CAST(dup_of AS VARCHAR) AS val "
        "FROM pairsleg "
        "UNION ALL SELECT 'span', doc_id, val FROM spanleg"
    ),
    "minhash_dedup": (
        # disjoint-token fixture corpus: the only near-dups are the planted
        # exact copies (+1M every 50th, +2M every 100th), each resolving to
        # its group's min-id representative = the original — once per leg
        # (batch sweep / incremental index)
        "WITH planted AS ("
        "SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, "
        "CAST(doc_id AS BIGINT) AS dup_of FROM documents WHERE doc_id % 50 = 0 "
        "UNION ALL "
        "SELECT CAST(doc_id + 2000000 AS BIGINT), CAST(doc_id AS BIGINT) "
        "FROM documents WHERE doc_id % 100 = 0) "
        "SELECT 'batch' AS leg, doc_id, dup_of FROM planted "
        "UNION ALL SELECT 'incr' AS leg, doc_id, dup_of FROM planted"
    ),
    "simhash_neardup": (
        # disjoint-token fixture corpus: output = planted copies at Hamming 0
        "SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id, "
        "CAST(doc_id AS BIGINT) AS dup_of, CAST(0 AS BIGINT) AS hamming "
        "FROM documents WHERE doc_id % 40 = 0"
    ),
    "embedding_neardup": (
        # ground truth: the planted exact copies (natural max cosine ~0.6 is
        # far below the 0.98 threshold, verified in tests)
        "SELECT CAST(vec_id + 1000000 AS BIGINT) AS vec_id, "
        "CAST(vec_id AS BIGINT) AS dup_of FROM embeddings WHERE vec_id % 50 = 0"
    ),
    "dedup_clusters_planted": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(doc_id - (doc_id % 5) AS BIGINT) AS cluster FROM documents "
        "WHERE doc_id % 5 <> 0 OR doc_id < (SELECT MAX(doc_id) FROM documents)"
    ),
    "ann_topk": (
        "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4) "
        "SELECT qid AS query_id, e.vec_id FROM q, embeddings e WHERE e.vec_id <> q.qid "
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY "
        "list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) <= 10"
    ),
    "ann_ivf_full": (
        # full probe is exact for BOTH execution paths (in-scan IVF and the
        # persisted inverted-list index), so one brute-force top-10 serves
        # both kind tags
        "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 4), "
        "top AS (SELECT qid AS query_id, e.vec_id FROM q, embeddings e "
        "WHERE e.vec_id <> q.qid "
        "QUALIFY row_number() OVER (PARTITION BY qid ORDER BY "
        "list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) <= 10) "
        "SELECT 'scan' AS kind, query_id, vec_id FROM top "
        "UNION ALL SELECT 'persisted' AS kind, query_id, vec_id FROM top "
        # lsh leg: planted exact copies — each probe query's top-1 is
        # provably its copy
        "UNION ALL SELECT 'lsh' AS kind, CAST(vec_id AS BIGINT) AS query_id, "
        "CAST(vec_id + 1000000 AS BIGINT) AS vec_id "
        "FROM embeddings WHERE vec_id % 50 = 0"
    ),
    "decontaminate": (
        # word 3-grams; eval = doc_id % 97 == 0; n_hits = count of DISTINCT
        # overlapping grams per train doc (only contaminated docs returned)
        "WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), "
        "'[a-z0-9]+') AS ws FROM documents), "
        "g AS (SELECT doc_id, array_to_string(ws[i:i+2], ' ') AS gram "
        "FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i) "
        "WHERE len(ws) >= 3), "
        "ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(count(DISTINCT gram) AS BIGINT) AS n_hits "
        "FROM g WHERE doc_id % 97 <> 0 "
        "AND gram IN (SELECT gram FROM ev) GROUP BY doc_id"
    ),
    "media_decode": (
        # deterministic synth media table at sf0.01: n=100, w = h = 64+(i%4)*32
        "WITH m AS (SELECT range AS i FROM range(100)) "
        "SELECT 'decode' AS stage, printf('m-%06d', i) AS media_id, "
        "CAST(64 + (i % 4) * 32 AS BIGINT) AS width, "
        "CAST(64 + (i % 4) * 32 AS BIGINT) AS height FROM m "
        "UNION ALL "
        "SELECT 'resize' AS stage, printf('m-%06d', i) AS media_id, "
        "CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height FROM m "
        "UNION ALL "
        "SELECT 'jpeg' AS stage, printf('m-%06d', i) AS media_id, "
        "CAST(64 + (i % 4) * 32 AS BIGINT) AS width, "
        "CAST(64 + (i % 4) * 32 AS BIGINT) AS height FROM m"
    ),
    "media_frames": (
        # deterministic synth media table at sf0.01: n=100, n_frames=(i%30)+1,
        # sampled every 10 frames; identical closed form for both containers
        "WITH m AS (SELECT range AS i, (range % 30) + 1 AS n_frames FROM range(100)), "
        "s AS (SELECT printf('m-%06d', i) AS media_id, "
        "CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx FROM m) "
        "SELECT 'gif' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mjpeg' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'avi' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mp4' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'fmp4' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mkv' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mpeg' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mpegps' AS stage, media_id, frame_idx FROM s "
        "UNION ALL SELECT 'mpegts' AS stage, media_id, frame_idx FROM s"
    ),
    "audio_features": (
        # 4096-sample 16 kHz synthetic clips; header + sample-count
        # round-trip, identical for PCM and fact-trimmed IMA ADPCM
        "WITH m AS (SELECT range AS i FROM range(100)), "
        "s AS (SELECT printf('m-%06d', i) AS media_id, "
        "CAST(16000 AS BIGINT) AS sample_rate, "
        "CAST(4096 AS BIGINT) AS n_samples FROM m) "
        "SELECT 'pcm' AS stage, * FROM s "
        "UNION ALL SELECT 'adpcm' AS stage, * FROM s "
        "UNION ALL SELECT 'ulaw' AS stage, * FROM s "
        "UNION ALL SELECT 'alaw' AS stage, * FROM s"
    ),
}
