"""Persisted IVF ANN index: build inverted lists ONCE, serve queries by
reading only the probed lists.

``functions/ann.py``'s ``ivf_topk`` routes during a FULL corpus scan —
right for one-shot dedup-ish sweeps, wrong for the platform shape where
similarity queries run repeatedly against a slowly-changing lake. This
module persists the routing: a trained coarse quantizer plus per-list
Parquet fragments, so a query at ``n_probe`` touches only the probed
fraction of the corpus bytes (fragments-read < corpus-fragments is
asserted in tests/test_functions.py).

Layout (the ``cdc/dedupidx.py`` persisted-index pattern):

    index_dir/
      state.json            # meta: dim, n_centroids, cols, n_rows, version
      centroids.npy         # (n_centroids, dim) float64 unit rows — tiny
      runs/run-<uuid>.parquet  # one sorted run per build/append task; ROW
                            # GROUPS aligned to list boundaries (the CDC
                            # engine's run-file pattern: files = #tasks,
                            # not #tasks × #lists)
      intents-*.parquet     # fragment manifest: (list_id, path, rg, rows)

Commit order mirrors the engine's 2-phase shape: run files land first
(tmp+rename), then the intents segment (tmp+rename — the commit point
readers key on), then state.json. A crash before the intents rename
leaves orphan run files invisible to readers; re-running the append is
idempotent-by-rebuild (the index is derived data).

Incremental append: new lake rows are assigned with the PERSISTED
quantizer (no retrain — recall for new rows matches the train-time
distribution; retrain by rebuilding) and land as new run files + a new
intents segment, LSM-style. Lists accumulate fragments across appends;
``fragment_count`` exposes the pile size so callers can rebuild when it
grows past taste.
"""

from __future__ import annotations

import glob
import json
import os
import uuid
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from .ann import _finalize_topk, _to_matrix, _train_centroids, _unit

_STATE = "state.json"
_CENTROIDS = "centroids.npy"


def _intents(rows: list[tuple[int, str, int, int]]) -> pa.Table:
    return pa.table({
        "list_id": pa.array([r[0] for r in rows], pa.int32()),
        "path": pa.array([r[1] for r in rows], pa.string()),
        "rg": pa.array([r[2] for r in rows], pa.int32()),
        "rows": pa.array([r[3] for r in rows], pa.int64()),
    })


def _write_list_run(t: pa.Table, index_dir: str, cent_ref,
                    emb_col: str, key_col: str) -> pa.Table:
    """Per-task build/append kernel: assign each row to its nearest
    centroid, sort by list id, write ONE run file whose row groups align
    with list boundaries, return the (list_id, path, rg, rows) intents."""
    if len(t) == 0:
        return _intents([])
    cent = ray.get(cent_ref)
    unit = _unit(_to_matrix(t[emb_col]))
    assign = np.argmax(unit @ cent.T, axis=1).astype(np.int32)
    order = np.argsort(assign, kind="stable")
    t = t.select([key_col, emb_col]).take(pa.array(order))
    assign = assign[order]
    bounds = np.flatnonzero(np.r_[True, assign[1:] != assign[:-1], True])
    rel = os.path.join("runs", f"run-{uuid.uuid4().hex[:12]}.parquet")
    final = os.path.join(index_dir, rel)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    rows: list[tuple[int, str, int, int]] = []
    writer = pq.ParquetWriter(tmp, t.schema, compression="lz4")
    try:
        for rg in range(len(bounds) - 1):
            lo, hi = int(bounds[rg]), int(bounds[rg + 1])
            writer.write_table(t.slice(lo, hi - lo), row_group_size=hi - lo)
            rows.append((int(assign[lo]), rel, rg, hi - lo))
    finally:
        writer.close()
    os.rename(tmp, final)
    return _intents(rows)


def _commit_intents(index_dir: str, intents: list[dict], state: dict) -> None:
    """Phase 2: intents segment (the readers' commit point), then state.
    Each fragment row carries the committing index VERSION — the staleness
    rank ``sync_ann_index``'s supersede entries compare against."""
    if intents:
        seg = os.path.join(
            index_dir, f"intents-v{state['version']:06d}-{uuid.uuid4().hex[:8]}.parquet")
        tbl = _intents([(int(i["list_id"]), i["path"], int(i["rg"]), int(i["rows"]))
                        for i in intents])
        tbl = tbl.append_column(
            "ver", pa.array(np.full(tbl.num_rows, state["version"], dtype=np.int32)))
        pq.write_table(tbl, seg + ".tmp")
        os.rename(seg + ".tmp", seg)
    tmp = os.path.join(index_dir, _STATE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.rename(tmp, os.path.join(index_dir, _STATE))


def _load_state(index_dir: str) -> tuple[dict, np.ndarray]:
    with open(os.path.join(index_dir, _STATE)) as f:
        state = json.load(f)
    cent = np.load(os.path.join(index_dir, _CENTROIDS))
    return state, cent


def load_intents(index_dir: str) -> pa.Table:
    """The fragment manifest: every committed (list_id, path, rg, rows)."""
    segs = sorted(glob.glob(os.path.join(index_dir, "intents-*.parquet")))
    if not segs:
        return _intents([])
    return pa.concat_tables([pq.read_table(s) for s in segs])


def fragment_count(index_dir: str) -> int:
    return load_intents(index_dir).num_rows


def build_ann_index(
    ds: rd.Dataset,
    index_dir: str,
    n_centroids: int = 64,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    sample_size: int = 4096,
    seed: int = 29,
) -> dict[str, Any]:
    """Train the coarse quantizer on a bounded sample, route the whole
    corpus to inverted lists in one distributed pass, persist. Raises if
    ``index_dir`` already holds an index (the index is derived — rebuild
    by removing the directory)."""
    if os.path.exists(os.path.join(index_dir, _STATE)):
        raise FileExistsError(f"ANN index already exists at {index_dir}")
    os.makedirs(index_dir, exist_ok=True)
    batches = [b for b in ds.limit(sample_size).iter_batches(
        batch_size=sample_size, batch_format="pyarrow") if b.num_rows]
    if not batches:
        raise ValueError(
            "cannot build an ANN index over an empty corpus (no rows with "
            f"a non-null {emb_col!r})")
    sample = _to_matrix(pa.concat_tables(batches)[emb_col])
    cent = _train_centroids(sample, n_centroids, seed=seed)
    np.save(os.path.join(index_dir, _CENTROIDS + ".tmp.npy"), cent)
    os.rename(os.path.join(index_dir, _CENTROIDS + ".tmp.npy"),
              os.path.join(index_dir, _CENTROIDS))
    import functools

    cent_ref = ray.put(cent)
    intents = ds.map_batches(
        functools.partial(_write_list_run, index_dir=index_dir,
                          cent_ref=cent_ref, emb_col=emb_col, key_col=key_col),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).take_all()  # small intent rows only
    n_rows = sum(int(i["rows"]) for i in intents)
    state = {"version": 1, "dim": int(cent.shape[1]),
             "n_centroids": int(cent.shape[0]), "emb_col": emb_col,
             "key_col": key_col, "n_rows": n_rows, "seed": seed,
             "sample_size": sample_size}
    _commit_intents(index_dir, intents, state)
    return {"n_rows": n_rows, "fragments": len(intents),
            "n_centroids": int(cent.shape[0]), "version": 1}


def append_ann_index(ds: rd.Dataset, index_dir: str) -> dict[str, Any]:
    """Incremental append: assign new rows with the persisted quantizer
    (no retrain), land new run files + one new intents segment."""
    state, cent = _load_state(index_dir)
    import functools

    cent_ref = ray.put(cent)
    intents = ds.map_batches(
        functools.partial(_write_list_run, index_dir=index_dir,
                          cent_ref=cent_ref, emb_col=state["emb_col"],
                          key_col=state["key_col"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True,
    ).take_all()
    n_new = sum(int(i["rows"]) for i in intents)
    state = dict(state)
    state["version"] = int(state["version"]) + 1
    state["n_rows"] = int(state["n_rows"]) + n_new
    _commit_intents(index_dir, intents, state)
    return {"n_rows_appended": n_new, "fragments_appended": len(intents),
            "version": state["version"]}


def plan_probe(index_dir: str, queries: pd.DataFrame, n_probe: int = 8,
               ) -> tuple[pa.Table, dict[int, np.ndarray]]:
    """Query planning, exposed for tests/metrics: the fragment rows a
    query set would READ (subset of the manifest — the partial-probe
    I/O bound) and the list_id → probing-query-indices map."""
    state, cent = _load_state(index_dir)
    q_unit = _unit(np.stack(queries[state["emb_col"]].to_numpy()).astype(np.float64))
    n_probe = min(n_probe, len(cent))
    q_probes = np.argsort(-(q_unit @ cent.T), axis=1)[:, :n_probe]
    probing = {int(c): np.flatnonzero((q_probes == c).any(axis=1))
               for c in np.unique(q_probes)}
    frags = load_intents(index_dir)
    keep = np.isin(frags["list_id"].to_numpy(zero_copy_only=False),
                   np.fromiter(probing, dtype=np.int32, count=len(probing)))
    return frags.filter(pa.array(keep)), probing


def query_ann_index(
    index_dir: str,
    queries: pd.DataFrame,
    k: int = 10,
    n_probe: int = 8,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Cosine top-k over the persisted index: reads ONLY the probed lists'
    fragments (one read task per fragment batch — no full-corpus scan).
    n_probe = n_centroids ⇒ exact (shares the brute-force oracle).
    Returns (query_id, key_col, score, rank)."""
    state, _ = _load_state(index_dir)
    emb_col, key_col = state["emb_col"], state["key_col"]
    q_ids = queries[key_col].to_numpy()
    q_unit = _unit(np.stack(queries[emb_col].to_numpy()).astype(np.float64))
    frags, probing = plan_probe(index_dir, queries, n_probe)
    # key type follows the query ids (string doc_id lakes vs int vec_id
    # corpora) so empty results — outer no-fragments AND per-block
    # all-dead fallbacks — union cleanly with non-empty ones
    key_t = (pa.string() if q_ids.dtype == object else
             pa.from_numpy_dtype(q_ids.dtype))
    if frags.num_rows == 0:
        empty = pa.table({"query_id": pa.array([], key_t),
                          key_col: pa.array([], key_t),
                          "score": pa.array([], pa.float64()),
                          "rank": pa.array([], pa.int64())})
        return rd.from_arrow(empty)
    dead = load_dead(index_dir)
    ref = ray.put({"q_ids": q_ids, "q_unit": q_unit, "probing": probing,
                   "dead": dead})

    def score_fragments(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        out_q, out_id, out_s = [], [], []
        # open each run file ONCE per block: a run holds one row group per
        # list, so probing k lists of the same run must not re-parse its
        # footer k times
        files: dict[str, pq.ParquetFile] = {}
        for row in range(t.num_rows):
            list_id = int(t["list_id"][row].as_py())
            q_rows = s["probing"].get(list_id)
            if q_rows is None or not len(q_rows):
                continue
            path = t["path"][row].as_py()
            pf = files.get(path)
            if pf is None:
                pf = files[path] = pq.ParquetFile(os.path.join(index_dir, path))
            frag = pf.read_row_group(int(t["rg"][row].as_py()))
            ids = frag[key_col].to_numpy(zero_copy_only=False)
            if s["dead"]:
                # staleness mask: a superseded/deleted key is live only in
                # fragments committed at ver >= its min_live_ver
                frag_ver = int(t["ver"][row].as_py())
                mlv = pd.Series(ids).map(s["dead"]).to_numpy()
                keep = np.flatnonzero(np.isnan(mlv) | (frag_ver >= mlv))
                if len(keep) == 0:
                    continue
                if len(keep) < len(ids):
                    ids = ids[keep]
                    frag = frag.take(pa.array(keep))
            unit = _unit(_to_matrix(frag[emb_col]))
            sims = unit @ s["q_unit"][q_rows].T  # |list| × |probing queries|
            for j, qi in enumerate(q_rows):
                qid = s["q_ids"][qi]
                col = sims[:, j]
                if exclude_self:
                    col = np.where(ids == qid, -np.inf, col)
                kk = min(k, len(col))
                top = np.argpartition(-col, kk - 1)[:kk] if kk else np.array([], np.int64)
                top = top[np.isfinite(col[top])]  # drop the masked self row
                out_q.append(np.full(len(top), qid))
                out_id.append(ids[top])
                out_s.append(col[top])
        if not out_q:
            return pa.table({"query_id": pa.array([], key_t),
                             key_col: pa.array([], key_t),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            key_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s)),
        })

    # one block per few fragments (sliced driver-side — the plan table is
    # tiny, and rd.from_arrow(list) makes one block per slice with no
    # repartition shuffle): fragment READS parallelize across the pool
    n_blocks = max(1, min(frags.num_rows, 64))
    step = -(-frags.num_rows // n_blocks)
    slices = [frags.slice(i, step) for i in range(0, frags.num_rows, step)]
    cand = rd.from_arrow(slices).map_batches(
        score_fragments, batch_format="pyarrow", zero_copy_batch=True,
    )
    return _finalize_topk(cand, key_col, k, len(q_ids))


# --------------------------------------------------------------------------
# lake sync: keep the index current off the CDC changes feed
# --------------------------------------------------------------------------

def load_dead(index_dir: str) -> dict:
    """The supersede map: key → min_live_ver (float; +inf = deleted until
    rebuild). Entries land one file per sync; later syncs override earlier
    ones for the same key (files sort by committing version). Size is
    O(keys churned since the last rebuild) — ``rebuild`` compacts it away
    with the fragment pile."""
    segs = sorted(glob.glob(os.path.join(index_dir, "dead-v*.parquet")))
    dead: dict = {}
    for s in segs:
        t = pq.read_table(s)
        dead.update(zip(t["key"].to_pylist(),
                        t["min_live_ver"].to_numpy(zero_copy_only=False)))
    return dead


def sync_ann_index(
    eng,
    index_dir: str,
    emb_col: str = "embedding",
    key_col: str = "doc_id",
    n_centroids: int = 64,
    sample_size: int = 4096,
    seed: int = 29,
) -> dict[str, Any]:
    """Keep a persisted IVF index current against a CDC lake (`eng` is a
    ``cdc.engine.CDCEngine``) using its incremental ``changes()`` feed —
    the repeated-query serving shape: build once, then each sync costs
    O(change set), never a corpus re-scan.

    First call builds from ``eng.scan()`` (rows with a null ``emb_col``
    are skipped) and records the lake manifest version. Later calls read
    ``changes(since, collapsed=True)``: upserted vectors APPEND as new
    run fragments (LSM — the old vector rows stay on disk), and every
    changed key gets a SUPERSEDE entry ``(key, min_live_ver)`` — ``V``
    (the appending index version) for upserts, ``+inf`` for deletes — so
    ``query_ann_index`` masks the stale rows. If the feed has been folded
    by compaction/vacuum (the engine's full-resync contract), the index
    is REBUILT from a fresh scan.

    Crash windows heal on re-sync: the lake version is committed LAST, so
    an interrupted sync reprocesses the same change set — re-appended
    vectors land at a higher version and the rewritten supersede entries
    mask the half-committed attempt's rows (same idempotence argument as
    the engine's content-addressed staging). Between an append and its
    supersede write, stale neighbors are transiently visible — acceptable
    for a derived, approximate structure.

    Rebuild (``rm -rf index_dir`` + sync, or a compaction-triggered
    resync) is the compaction story for both the fragment pile and the
    supersede map."""
    import hashlib as _hashlib

    state_path = os.path.join(index_dir, _STATE)

    def _full_build() -> dict[str, Any]:
        import shutil

        if os.path.isdir(index_dir):
            shutil.rmtree(index_dir)
        live = eng.scan(columns=[key_col, emb_col]).map_batches(
            lambda t: t.filter(pa.compute.is_valid(t[emb_col])),
            batch_format="pyarrow", zero_copy_batch=True)
        out = build_ann_index(live, index_dir, n_centroids=n_centroids,
                              emb_col=emb_col, key_col=key_col,
                              sample_size=sample_size, seed=seed)
        st, _ = _load_state(index_dir)
        st["lake_version"] = int(eng.manifest.version)
        _commit_intents(index_dir, [], st)
        out["mode"] = "build"
        out["lake_version"] = st["lake_version"]
        return out

    if not os.path.exists(state_path):
        return _full_build()

    state, _ = _load_state(index_dir)
    since = int(state.get("lake_version", -1))
    cur = int(eng.manifest.version)
    if since == cur:
        return {"mode": "noop", "lake_version": cur, "n_appended": 0}
    try:
        # materialize: both the vector append and the supersede pass read
        # the same collapsed change set — one execution of the fragment
        # reads + per-partition collapse, not two (change sets are small
        # by the feed's retention contract)
        ch = eng.changes(since, collapsed=True).materialize()
    except RuntimeError:  # feed folded by compaction / manifest vacuumed
        return _full_build()

    def _upserts(t: pa.Table) -> pa.Table:
        if emb_col not in t.column_names:
            # schema-stable EMPTY feed blocks carry only the WAL columns
            # (engine.changes's no-fragments fallback) — nothing to append.
            # The fallback's column types are nominal: the only consumer
            # (_write_list_run) short-circuits zero-row blocks before
            # touching any column, and nothing downstream unifies block
            # schemas, so a lake with e.g. list<float32> embeddings never
            # sees this float64 placeholder conflict.
            return pa.table({key_col: pa.array([], pa.string()),
                             emb_col: pa.array([], pa.list_(pa.float64()))})
        return t.filter(
            pa.compute.and_(pa.compute.not_equal(t["op"], pa.scalar("D")),
                            pa.compute.is_valid(t[emb_col]))
        ).select([key_col, emb_col])

    ups = ch.map_batches(_upserts, batch_format="pyarrow", zero_copy_batch=True)
    app = append_ann_index(ups, index_dir)
    v_new = int(app["version"])

    def write_dead(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"path": pa.array([], pa.string())})
        keys = t[key_col].to_pylist()
        is_del = pa.compute.equal(t["op"], pa.scalar("D")).to_numpy(
            zero_copy_only=False)
        mlv = np.where(is_del, np.inf, float(v_new))
        out = pa.table({"key": pa.array(keys),
                        "min_live_ver": pa.array(mlv, pa.float64())})
        name = _hashlib.sha1(
            "\x00".join(sorted(map(str, keys))).encode()).hexdigest()[:16]
        final = os.path.join(index_dir, f"dead-v{v_new:06d}-{name}.parquet")
        tmp = final + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp)
        os.rename(tmp, final)
        return pa.table({"path": pa.array([final], pa.string())})

    n_dead = ch.select_columns([key_col, "op"]).map_batches(
        write_dead, batch_format="pyarrow", batch_size=None).count()

    state, _ = _load_state(index_dir)  # re-read: append bumped version
    state["lake_version"] = cur
    _commit_intents(index_dir, [], state)
    return {"mode": "incremental", "lake_version": cur,
            "n_appended": int(app["n_rows_appended"]),
            "version": v_new, "dead_shards": int(n_dead)}


def maybe_rebuild(eng, index_dir: str, max_fragments: int = 4096,
                  max_dead: int = 100_000) -> dict[str, Any]:
    """The index's compaction policy (callers run it after ``sync``):
    rebuild from a fresh lake scan once the LSM fragment pile or the
    supersede map grows past taste — both are O(churn since last rebuild)
    and a rebuild resets them to O(corpus / n_centroids) and {} while
    retraining the quantizer on current data (same n_centroids /
    sample_size / seed as the live index). No-op otherwise.

    Builds into a SIBLING temp dir and atomically swaps only on success —
    a failed rebuild (e.g. the lake emptied out underneath) leaves the
    old index serving instead of destroying it."""
    frags = fragment_count(index_dir)
    dead = len(load_dead(index_dir))
    if frags <= max_fragments and dead <= max_dead:
        return {"mode": "noop", "fragments": frags, "dead": dead}
    import shutil

    state, _ = _load_state(index_dir)
    tmp = f"{index_dir}.rebuild-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        out = sync_ann_index(eng, tmp, emb_col=state["emb_col"],
                             key_col=state["key_col"],
                             n_centroids=state["n_centroids"],
                             sample_size=state.get("sample_size", 4096),
                             seed=state.get("seed", 29))
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    old = f"{index_dir}.old-{os.getpid()}"
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old, ignore_errors=True)
    out.update({"fragments_before": frags, "dead_before": dead})
    return out
