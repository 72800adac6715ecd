"""Persisted ANN index kept current off the CDC changes feed."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from go_tfdata_ray.cdc.engine import CDCEngine, DEFAULT_TARGET
from go_tfdata_ray.functions import ann, annidx
from go_tfdata_ray.sources import wal as walmod
from go_tfdata_ray.stages.schema import SchemaPolicy

DIM = 12


def _vec(i, flip=False):
    rng = np.random.default_rng(1000 + i)
    v = rng.normal(size=DIM)
    return (-v if flip else v) / np.linalg.norm(v)


def _wal_epoch(wal_dir, epoch, rows):
    """rows: list of (doc_id, op, emb|None). Seqs are epoch-scaled."""
    d = walmod.open_segment(wal_dir, epoch)
    n = len(rows)
    t = pa.table({
        "seq": pa.array((np.int64(epoch) << 32) + np.arange(n, dtype=np.int64)),
        "epoch": pa.array(np.full(n, epoch, dtype=np.int32)),
        "op": pa.array([op for _, op, _ in rows], pa.string()),
        "doc_id": pa.array([k for k, _, _ in rows], pa.string()),
        "tokens": pa.array([[1, 2]] * n, pa.list_(pa.int32())),
        "n_tok": pa.array(np.full(n, 2, dtype=np.int32)),
        "source": pa.array(["t"] * n, pa.string()),
        "embedding": pa.array(
            [None if e is None else list(e) for _, _, e in rows],
            pa.list_(pa.float64())),
    })
    pq.write_table(t, os.path.join(d, "shard-00000.parquet"))
    walmod.seal_segment(d)


def _neighbors(res, qid):
    df = res.to_pandas()
    return list(df[df["query_id"] == qid].sort_values("rank")["doc_id"])


def test_sync_ann_index_build_update_delete_rebuild(tmp_path):
    wal_dir = str(tmp_path / "wal")
    idx = str(tmp_path / "annidx")
    policy = SchemaPolicy(
        target=DEFAULT_TARGET.append(pa.field("embedding", pa.list_(pa.float64()))))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4, policy=policy)

    # epoch 0: 60 docs
    _wal_epoch(wal_dir, 0, [(f"d{i:03d}", "U", _vec(i)) for i in range(60)])
    eng.apply_wal(wal_dir)
    r = annidx.sync_ann_index(eng, idx, emb_col="embedding", key_col="doc_id",
                              n_centroids=8)
    assert r["mode"] == "build" and r["n_rows"] == 60

    queries = pd.DataFrame({"doc_id": ["q5", "q7"],
                            "embedding": [_vec(5), _vec(7)]})
    got = annidx.query_ann_index(idx, queries, k=3, n_probe=8)
    assert _neighbors(got, "q5")[0] == "d005"
    assert _neighbors(got, "q7")[0] == "d007"

    # re-sync with no lake change: noop
    assert annidx.sync_ann_index(eng, idx)["mode"] == "noop"

    # epoch 1: d005 re-embedded to the OPPOSITE direction (stale vector must
    # be masked), d060 appears near q5, d007 deleted
    _wal_epoch(wal_dir, 1, [
        ("d005", "U", _vec(5, flip=True)),
        ("d060", "U", _vec(5) + 0.01),
        ("d007", "D", None),
    ])
    eng.apply_wal(wal_dir)
    r2 = annidx.sync_ann_index(eng, idx)
    assert r2["mode"] == "incremental" and r2["n_appended"] == 2

    got2 = annidx.query_ann_index(idx, queries, k=3, n_probe=8)
    n5 = _neighbors(got2, "q5")
    assert n5[0] == "d060"          # the new near-duplicate wins
    assert "d005" not in n5         # old d005 vector masked; new one is opposite
    assert "d007" not in _neighbors(got2, "q7")  # deleted

    # full-probe equality vs brute force over the CURRENT lake state — the
    # supersede masking must reproduce exactly what a fresh scan would say
    live = eng.scan(columns=["doc_id", "embedding"])
    exact = ann.brute_force_topk(live, queries, k=3, emb_col="embedding",
                                 key_col="doc_id").to_pandas()
    for qid in ("q5", "q7"):
        e = list(exact[exact["query_id"] == qid].sort_values("rank")["doc_id"])
        assert _neighbors(got2, qid) == e

    # deleted-then-reinserted key becomes visible again
    _wal_epoch(wal_dir, 2, [("d007", "U", _vec(7))])
    eng.apply_wal(wal_dir)
    r3 = annidx.sync_ann_index(eng, idx)
    assert r3["mode"] == "incremental" and r3["n_appended"] == 1
    got3 = annidx.query_ann_index(idx, queries, k=3, n_probe=8)
    assert _neighbors(got3, "q7")[0] == "d007"

    # compaction folds the change feed → sync falls back to a full rebuild
    eng.compact()
    _wal_epoch(wal_dir, 3, [("d061", "U", _vec(61))])
    eng.apply_wal(wal_dir)
    eng.compact()
    r4 = annidx.sync_ann_index(eng, idx)
    assert r4["mode"] == "build"
    # rebuild compacted the supersede map away
    assert annidx.load_dead(idx) == {}
    got4 = annidx.query_ann_index(idx, queries, k=3, n_probe=8)
    for qid in ("q5", "q7"):
        assert _neighbors(got4, qid) == _neighbors(got3, qid)


def test_sync_ann_index_pq_dead_mask(tmp_path):
    """PQ-coded index off the CDC feed: the supersede mask applies in the
    ADC path too — a re-embedded key's stale codes and a deleted key never
    surface from an adc_refine query."""
    wal_dir = str(tmp_path / "wal")
    idx = str(tmp_path / "annidx")
    policy = SchemaPolicy(
        target=DEFAULT_TARGET.append(pa.field("embedding", pa.list_(pa.float64()))))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=4, policy=policy)
    _wal_epoch(wal_dir, 0, [(f"d{i:03d}", "U", _vec(i)) for i in range(60)])
    eng.apply_wal(wal_dir)
    r = annidx.sync_ann_index(eng, idx, emb_col="embedding", key_col="doc_id",
                              n_centroids=8, pq_m=4)
    assert r["mode"] == "build"
    assert annidx._load_state(idx)[0]["pq_m"] == 4

    queries = pd.DataFrame({"doc_id": ["q5", "q7"],
                            "embedding": [_vec(5), _vec(7)]})
    got = annidx.query_ann_index(idx, queries, k=3, n_probe=8,
                                 mode="adc_refine")
    assert _neighbors(got, "q5")[0] == "d005"

    _wal_epoch(wal_dir, 1, [
        ("d005", "U", _vec(5, flip=True)),
        ("d060", "U", _vec(5) + 0.01),
        ("d007", "D", None),
    ])
    eng.apply_wal(wal_dir)
    r2 = annidx.sync_ann_index(eng, idx)  # pq_m persists via state
    assert r2["mode"] == "incremental"
    got2 = annidx.query_ann_index(idx, queries, k=3, n_probe=8,
                                  mode="adc_refine")
    n5 = _neighbors(got2, "q5")
    assert n5[0] == "d060" and "d005" not in n5
    assert "d007" not in _neighbors(got2, "q7")


def test_sync_interrupted_between_append_and_supersede_heals(tmp_path):
    """Crash window: append committed, supersede entries + lake_version not
    yet written. The re-run reprocesses the same change set; its higher
    version supersede entries mask the half-committed duplicates."""
    wal_dir = str(tmp_path / "wal")
    idx = str(tmp_path / "annidx")
    policy = SchemaPolicy(
        target=DEFAULT_TARGET.append(pa.field("embedding", pa.list_(pa.float64()))))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2, policy=policy)
    _wal_epoch(wal_dir, 0, [(f"d{i:03d}", "U", _vec(i)) for i in range(20)])
    eng.apply_wal(wal_dir)
    annidx.sync_ann_index(eng, idx, emb_col="embedding", key_col="doc_id",
                          n_centroids=4)

    _wal_epoch(wal_dir, 1, [("d003", "U", _vec(3, flip=True))])
    eng.apply_wal(wal_dir)
    # simulate the crash: perform ONLY the append half of the sync
    ch = eng.changes(annidx._load_state(idx)[0]["lake_version"], collapsed=True)
    ups = ch.map_batches(
        lambda t: t.filter(pa.compute.is_valid(t["embedding"])).select(
            ["doc_id", "embedding"]),
        batch_format="pyarrow")
    annidx.append_ann_index(ups, idx)
    # ...lake_version was never advanced; the re-run sees the same changes
    r = annidx.sync_ann_index(eng, idx)
    assert r["mode"] == "incremental"

    q = pd.DataFrame({"doc_id": ["q3"], "embedding": [_vec(3)]})
    got = annidx.query_ann_index(idx, q, k=2, n_probe=4).to_pandas()
    # exactly one live d003 row — and it's the flipped one, so it can't be
    # q3's nearest neighbor anymore
    assert list(got["doc_id"]).count("d003") == 0 or \
        got[got["doc_id"] == "d003"]["score"].max() < 0.5
    # the duplicate from the interrupted append never surfaces twice
    assert got["doc_id"].duplicated().sum() == 0


def test_sync_after_compact_only_change_is_clean(tmp_path):
    """compact() bumps the manifest version without new change rows; the
    feed then returns its schema-stable EMPTY blocks (WAL columns only,
    no embedding) — sync must treat that as zero work, not crash."""
    wal_dir = str(tmp_path / "wal")
    idx = str(tmp_path / "annidx")
    policy = SchemaPolicy(
        target=DEFAULT_TARGET.append(pa.field("embedding", pa.list_(pa.float64()))))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2, policy=policy)
    _wal_epoch(wal_dir, 0, [(f"d{i:03d}", "U", _vec(i)) for i in range(12)])
    eng.apply_wal(wal_dir)
    annidx.sync_ann_index(eng, idx, emb_col="embedding", key_col="doc_id",
                          n_centroids=4)

    v_before = eng.manifest.version
    eng.compact()
    assert eng.manifest.version > v_before
    r = annidx.sync_ann_index(eng, idx)
    assert r["n_appended"] == 0 and r["mode"] in ("incremental", "build")

    q = pd.DataFrame({"doc_id": ["q2"], "embedding": [_vec(2)]})
    got = annidx.query_ann_index(idx, q, k=2, n_probe=4).to_pandas()
    assert list(got.sort_values("rank")["doc_id"])[0] == "d002"


def test_query_empty_probe_key_type_matches(tmp_path):
    """Zero probed fragments must still emit the caller's key type (a
    hand-built empty index: state + centroids, no committed intents)."""
    import json

    idx = str(tmp_path / "annidx")
    os.makedirs(idx)
    np.save(os.path.join(idx, "centroids.npy.tmp.npy"),
            np.eye(2, DIM)[:2])
    os.rename(os.path.join(idx, "centroids.npy.tmp.npy"),
              os.path.join(idx, "centroids.npy"))
    with open(os.path.join(idx, "state.json"), "w") as f:
        json.dump({"version": 1, "dim": DIM, "n_centroids": 2,
                   "emb_col": "embedding", "key_col": "doc_id",
                   "n_rows": 0, "seed": 0}, f)

    q = pd.DataFrame({"doc_id": ["qx"], "embedding": [_vec(1)]})
    out = annidx.query_ann_index(idx, q, k=2, n_probe=2)
    assert out.count() == 0
    sch = dict(zip(out.schema().names, map(str, out.schema().types)))
    # key/query types match the caller's string keys, so rare empty-probe
    # results union cleanly with non-empty ones
    assert sch["doc_id"] == "string" and sch["query_id"] == "string"

    # an empty corpus is a clear error at build time, not a concat crash
    import pytest as _pytest
    import ray.data as _rd
    import pyarrow as _pa
    empty = _rd.from_arrow(_pa.table({
        "doc_id": _pa.array([], _pa.string()),
        "embedding": _pa.array([], _pa.list_(_pa.float64()))}))
    with _pytest.raises(ValueError, match="empty corpus"):
        annidx.build_ann_index(empty, str(tmp_path / "idx2"), n_centroids=2,
                               emb_col="embedding", key_col="doc_id")


def test_maybe_rebuild_policy(tmp_path):
    wal_dir = str(tmp_path / "wal")
    idx = str(tmp_path / "annidx")
    policy = SchemaPolicy(
        target=DEFAULT_TARGET.append(pa.field("embedding", pa.list_(pa.float64()))))
    eng = CDCEngine(str(tmp_path / "lake"), num_partitions=2, policy=policy)
    _wal_epoch(wal_dir, 0, [(f"d{i:03d}", "U", _vec(i)) for i in range(20)])
    eng.apply_wal(wal_dir)
    annidx.sync_ann_index(eng, idx, emb_col="embedding", key_col="doc_id",
                          n_centroids=4)
    # churn to grow the dead map
    _wal_epoch(wal_dir, 1, [(f"d{i:03d}", "U", _vec(i, flip=True))
                            for i in range(10)])
    eng.apply_wal(wal_dir)
    annidx.sync_ann_index(eng, idx)
    assert len(annidx.load_dead(idx)) == 10

    assert annidx.maybe_rebuild(eng, idx)["mode"] == "noop"  # under thresholds
    r = annidx.maybe_rebuild(eng, idx, max_dead=5)           # over → rebuild
    assert r["mode"] == "build" and r["dead_before"] == 10
    assert annidx.load_dead(idx) == {}
    q = pd.DataFrame({"doc_id": ["q15"], "embedding": [_vec(15)]})
    got = annidx.query_ann_index(idx, q, k=1, n_probe=4).to_pandas()
    assert got.iloc[0]["doc_id"] == "d015"


def test_cli_ingest_tar(tmp_path):
    """--tar drop path: member stem = URI, .txt member = text."""
    import io
    import tarfile

    from go_tfdata_ray.cdc.cli import main
    from go_tfdata_ray.cdc.engine import CDCEngine

    drop = str(tmp_path / "drop.tar")
    with tarfile.open(drop, "w") as tf:
        for i in range(6):
            body = f"tar doc {i}".encode()
            info = tarfile.TarInfo(name=f"site/page-{i}.txt")
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    wal_dir = str(tmp_path / "wal")
    assert main(["ingest", "--wal", wal_dir, "--tar", drop]) == 0
    lake = str(tmp_path / "lake")
    assert main(["tail", "--wal", wal_dir, "--lake", lake, "--partitions", "2",
                 "--poll", "0.01", "--idle-limit", "1"]) == 0
    eng = CDCEngine(lake)
    assert eng.scan_table(columns=["doc_id"]).num_rows == 6
