"""Property-based tests (hypothesis): the collapse/merge kernels must match
a brute-force dict replay for ANY event stream — the generalization of the
reference's round-trip equality tests (tfrecord_test.go:132-176)."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from go_tfdata_ray.cdc.collapse import collapse_latest, hash_partition, merge_on_read

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 9),                      # key index
        st.sampled_from(["I", "U", "D"]),       # op
        st.lists(st.integers(0, 100), max_size=4),  # tokens
    ),
    min_size=0, max_size=60,
)


def to_table(events):
    return pa.table(
        {
            "seq": pa.array(range(len(events)), pa.int64()),
            "op": pa.array([op for _, op, _ in events], pa.string()),
            "doc_id": pa.array([f"k{k}" for k, _, _ in events], pa.string()),
            "tokens": pa.array([t for _, _, t in events], pa.list_(pa.int32())),
        }
    )


def dict_replay(events):
    state = {}
    for seq, (k, op, toks) in enumerate(events):
        if op == "D":
            state.pop(f"k{k}", None)
        else:
            state[f"k{k}"] = (seq, toks)
    return state


@given(events_strategy)
@settings(max_examples=200, deadline=None)
def test_collapse_latest_keeps_max_seq(events):
    t = to_table(events)
    out = collapse_latest(t)
    want_latest = {}
    for seq, (k, op, toks) in enumerate(events):
        want_latest[f"k{k}"] = seq
    got = dict(zip(out["doc_id"].to_pylist(), out["seq"].to_pylist()))
    assert got == want_latest


@given(events_strategy, st.integers(1, 4))
@settings(max_examples=100, deadline=None)
def test_merge_on_read_any_fragmentation_matches_dict_replay(events, n_frags):
    """Split the stream into arbitrary contiguous fragments (ranks = order);
    merge_on_read must equal the sequential dict replay."""
    t = to_table(events)
    cuts = np.linspace(0, len(events), n_frags + 1).astype(int)
    frags = [t.slice(int(lo), int(hi - lo)) for lo, hi in zip(cuts[:-1], cuts[1:])]
    merged = merge_on_read(frags, ranks=list(range(len(frags))))
    want = dict_replay(events)
    got = {
        d: (s, toks)
        for d, s, toks in zip(
            merged["doc_id"].to_pylist(), merged["seq"].to_pylist(),
            merged["tokens"].to_pylist(),
        )
    }
    assert got == want


@given(events_strategy)
@settings(max_examples=100, deadline=None)
def test_merge_on_read_duplicate_fragment_idempotent(events):
    """At-least-once delivery: merging a fragment twice (same rank) must not
    change the result."""
    t = to_table(events)
    once = merge_on_read([t], ranks=[0])
    twice = merge_on_read([t, t], ranks=[0, 0])
    assert once.sort_by("doc_id").equals(twice.sort_by("doc_id"))


@given(st.lists(st.text(max_size=8), min_size=1, max_size=50), st.integers(1, 64))
@settings(max_examples=100, deadline=None)
def test_hash_partition_stable_and_in_range(keys, parts):
    a = hash_partition(pa.array(keys, pa.string()), parts)
    b = hash_partition(pa.array(keys, pa.string()), parts)
    assert (a == b).all() and (a >= 0).all() and (a < parts).all()


# --- range-join bin-replication routing invariant ---------------------------

@given(
    st.lists(st.floats(-1000, 1000, allow_nan=False), min_size=1, max_size=40),
    st.lists(st.tuples(st.floats(-1000, 1000, allow_nan=False),
                       st.floats(0, 200, allow_nan=False)),
             min_size=1, max_size=25),
    st.sampled_from([7.5, 50.0, 130.0]),
)
@settings(max_examples=60, deadline=None)
def test_range_join_bin_routing_meets_each_pair_exactly_once(xs, ivs, bw):
    """The binned range_join invariant (stages/joins.py): an interval is
    replicated into every bin it overlaps, a point sits in one bin, so a
    matching pair meets in EXACTLY one bin — for any floats, including
    negative domains (floor_divide semantics)."""
    xs = np.array(xs)
    lo = np.array([a for a, _ in ivs])
    hi = lo + np.array([w for _, w in ivs])
    pbin = np.floor_divide(xs, bw).astype(np.int64)
    lob = np.floor_divide(lo, bw).astype(np.int64)
    hib = np.floor_divide(hi, bw).astype(np.int64)
    for i, x in enumerate(xs):
        for j in range(len(lo)):
            meets = int(lob[j] <= pbin[i] <= hib[j])  # replicated bins = [lob, hib]
            if lo[j] <= x <= hi[j]:
                assert meets == 1  # matching pair meets exactly once
            # non-matching pairs may share a bin (filtered by the mask), but
            # replication never duplicates: bins [lob..hib] are distinct by
            # construction (a contiguous integer range)


# --- quantile_disc index rule vs DuckDB -------------------------------------

@given(
    st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=120),
    st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.95, 0.99, 1.0]),
)
@settings(max_examples=40, deadline=None)
def test_quantile_disc_rule_matches_duckdb(vals, q):
    """relational.quantiles_per_group's index rule (0-based ceil(q*n)-1 of
    the sorted run) must equal DuckDB quantile_disc for any multiset."""
    import duckdb

    vs = np.sort(np.array(vals, dtype=np.float64))
    want = duckdb.sql(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)", params=[q, list(vals)]
    ).fetchone()[0]
    got = vs[int(np.ceil(q * len(vs))) - 1]
    assert got == want


# --- rolling per-key cumsum shard kernel ------------------------------------

@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 10**6),
                          st.integers(-100, 100)),
                min_size=0, max_size=80))
@settings(max_examples=60, deadline=None)
def test_rolling_shard_kernel_matches_pandas(rows):
    """The per-shard cumsum-with-base-subtraction in rolling_per_key equals
    pandas' groupby cumsum for any (key, order, value) multiset."""
    df = pd.DataFrame(rows, columns=["k", "o", "v"]).assign(_shard=0)
    from go_tfdata_ray.stages.relational import rolling_per_key  # noqa: F401 (module import sanity)

    # replicate roll_shard's math
    g = df.sort_values(["k", "o"], kind="mergesort").drop(columns=["_shard"])
    if len(g):
        keys = g["k"].to_numpy()
        v = g["v"].to_numpy().astype(np.int64)
        cs = np.cumsum(v)
        new_key = np.r_[True, keys[1:] != keys[:-1]]
        base = (cs - v)[np.flatnonzero(new_key)]
        key_idx = np.cumsum(new_key) - 1
        got = cs - base[key_idx]
        want = g.groupby("k", sort=False)["v"].cumsum().to_numpy()
        assert (got == want).all()


# -- object-store exchange: must equal a pandas reference for ANY frame ------

# min_size=1: an all-empty input legitimately returns a schemaless empty
# Dataset (fn never ran, so its output schema is unknowable)
exchange_frames = st.lists(
    st.tuples(st.integers(0, 20), st.integers(-1000, 1000)),
    min_size=1, max_size=120,
)


@given(rows=exchange_frames, num_shards=st.sampled_from([1, 3, 8]),
       blocks=st.integers(1, 5))
@settings(max_examples=15, deadline=None)
def test_exchange_group_map_matches_pandas(rows, num_shards, blocks):
    import ray.data as rd

    from go_tfdata_ray.stages.exchange import exchange_group_map

    df = pd.DataFrame({"k": [k for k, _ in rows], "v": [v for _, v in rows]})
    df["k"] = df["k"].astype(np.int64)
    df["v"] = df["v"].astype(np.int64)
    df["_shard"] = (df["k"] % num_shards).astype(np.int64)
    ds = rd.from_pandas(df).repartition(blocks)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False, as_index=False)["v"].sum()

    got = exchange_group_map(ds, agg, num_shards).to_pandas()
    want = df.groupby("k", sort=False, as_index=False)["v"].sum()
    got = got.sort_values("k").reset_index(drop=True)
    want = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]],
                                  check_dtype=False)


@given(rows=exchange_frames, blocks=st.integers(1, 5))
@settings(max_examples=10, deadline=None)
def test_exchange_coalesce_map_matches_pandas(rows, blocks):
    import ray.data as rd

    from go_tfdata_ray.stages.exchange import exchange_coalesce_map

    df = pd.DataFrame({"k": [k for k, _ in rows], "v": [v for _, v in rows]})
    df["k"] = df["k"].astype(np.int64)
    df["v"] = df["v"].astype(np.int64)
    ds = rd.from_pandas(df).repartition(blocks)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False, as_index=False)["v"].sum()

    got = exchange_coalesce_map(ds, agg).to_pandas()
    want = df.groupby("k", sort=False, as_index=False)["v"].sum()
    pd.testing.assert_frame_equal(
        got.sort_values("k").reset_index(drop=True)[["k", "v"]],
        want.sort_values("k").reset_index(drop=True)[["k", "v"]],
        check_dtype=False,
    )


# --- WARC framing (sources/warc.py) ----------------------------------------

_warc_payloads = st.lists(st.binary(min_size=0, max_size=300),
                          min_size=1, max_size=12)


@given(payloads=_warc_payloads,
       inject=st.lists(st.sampled_from(
           [b"", b"\r\n\r\n", b"\r\nWARC/1.0\r\n", b"Content-Length: 9\r\n",
            b"\x00\xff\x1f\x8b"]), min_size=1, max_size=12),
       gz=st.booleans())
@settings(max_examples=60, deadline=None)
def test_warc_roundtrip_adversarial_payloads(tmp_path_factory, payloads,
                                             inject, gz):
    """Content-Length framing must roundtrip payloads that embed CRLF
    delimiters, fake version lines, fake headers and gzip magic — byte
    for byte, in both the plain and per-record-gzip layouts."""
    from go_tfdata_ray.sources import warc as warcmod

    body = [p + inj for p, inj in
            zip(payloads, (inject * len(payloads))[:len(payloads)])]
    d = tmp_path_factory.mktemp("warcprop")
    path = str(d / ("p.warc.gz" if gz else "p.warc"))
    n = warcmod.write_warc(path, (
        {"warc_type": "resource", "uri": f"u:{i}", "payload": b}
        for i, b in enumerate(body)))
    assert n == len(body)
    got = list(warcmod.iter_warc_records(path))
    assert [g["payload"] for g in got] == body
    assert [g["headers"]["WARC-Target-URI"] for g in got] == \
        [f"u:{i}" for i in range(len(body))]
