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
