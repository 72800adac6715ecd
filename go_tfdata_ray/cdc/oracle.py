"""Single-process oracle replay for correctness checks.

The analog of the reference's round-trip equality tests
(`/root/reference/test/tfrecord_test.go:132-176`: write N, read back, assert
`protobuf.Equal` element-wise): replay the WAL in seq order into a plain
dict and compare the engine's merged lake against it with EXACT per-row
``tokens`` array equality.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .collapse import collapse_latest


def oracle_final_state(wal_files: list[str]) -> pa.Table:
    """Vectorized oracle: last event per doc_id by seq wins; 'D' removes.
    (Exact duplicates share a seq; payloads are identical so ties are
    harmless.) Returns (doc_id, tokens, n_tok, source) sorted by doc_id."""
    t = pa.concat_tables([pq.read_table(f) for f in wal_files], promote_options="permissive")
    final = collapse_latest(t, key="doc_id", order_cols=("seq",))
    final = final.filter(pc.not_equal(final["op"], pa.scalar("D")))
    return final.select(["doc_id", "tokens", "n_tok", "source"]).sort_by("doc_id")


def oracle_replay_dict(wal_files: list[str]) -> dict[str, dict]:
    """Row-at-a-time dict replay (the FIXTURES.md §5 oracle) — intentionally
    naive and independent of the vectorized kernels it checks."""
    t = pa.concat_tables([pq.read_table(f) for f in wal_files], promote_options="permissive")
    t = t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))
    state: dict[str, dict] = {}
    for row in t.to_pylist():
        if row["op"] == "D":
            state.pop(row["doc_id"], None)
        else:
            state[row["doc_id"]] = {
                "doc_id": row["doc_id"],
                "tokens": row["tokens"],
                "n_tok": row["n_tok"],
                "source": row["source"],
            }
    return state


def assert_tables_equal(actual: pa.Table, expected: pa.Table) -> None:
    """Exact set-of-rows equality keyed by doc_id, element-wise tokens."""
    a = actual.select(expected.column_names).sort_by("doc_id")
    e = expected.sort_by("doc_id")
    assert a.num_rows == e.num_rows, f"row count {a.num_rows} != {e.num_rows}"
    a = a.cast(e.schema)
    if not a.equals(e):
        for name in e.column_names:  # pinpoint the first differing row/col
            ac, ec = a[name].combine_chunks(), e[name].combine_chunks()
            if not ac.equals(ec):
                for i in range(len(ac)):
                    if ac[i].as_py() != ec[i].as_py():
                        raise AssertionError(
                            f"column {name} row {i}: {ac[i].as_py()!r} != {ec[i].as_py()!r}"
                        )
        raise AssertionError("tables differ")
