import pyarrow.parquet as pq

from go_tfdata_ray.sources.wal import (
    WalParams,
    generate_wal,
    list_segments,
    synth_events,
    wal_params_for_sf,
)


def test_synth_deterministic():
    p = WalParams(n_events=1000, n_keys=200, num_epochs=3)
    a, b = synth_events(p), synth_events(p)
    assert a.equals(b)
    assert a.num_rows == 1000
    # first event per key is an insert
    seen = set()
    for row in a.to_pylist():
        if row["doc_id"] not in seen:
            assert row["op"] == "I"
            seen.add(row["doc_id"])
    # deletes carry empty payload; others have n_tok == len(tokens)
    for row in a.to_pylist():
        assert row["n_tok"] == len(row["tokens"])
        if row["op"] == "D":
            assert row["tokens"] == []


def test_generate_idempotent(tmp_path):
    p = WalParams(n_events=500, n_keys=100, num_epochs=2)
    d = str(tmp_path / "wal")
    files1 = generate_wal(d, p)
    files2 = generate_wal(d, p)
    assert files1 == files2
    assert len(files1) == 2
    assert [e for e, _ in list_segments(d)] == [0, 1]
    total = sum(pq.read_table(f).num_rows for f in files1)
    assert total == 500


def test_dup_injection(tmp_path):
    p = WalParams(n_events=400, n_keys=80, num_epochs=4, dup_rate=0.1)
    files = generate_wal(str(tmp_path / "wal"), p)
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == 400 + 40


def test_sf_params():
    p = wal_params_for_sf("/root/testdata/sf0.01")
    assert p.n_events == 60_000
    assert wal_params_for_sf("/root/testdata/sf0.001").n_events == 6_000
