"""Incremental content dedup: dedup NEWLY ingested docs against a persisted
content-hash index, without rescanning the lake.

``CDCEngine.dedup_lake`` is the full-corpus maintenance pass; at 10^10 docs
re-running it per micro-batch would re-hash the whole lake every time. This
module keeps a hash-sharded index of (content-hash → winning doc_id) under
``lake/_dedup_index/`` and, per run, processes only the NET CHANGE SET since
the last run (``CDCEngine.changes(collapsed=True)``) — work is O(new docs),
not O(lake).

Correctness under churn: index entries go stale when their doc is later
updated or deleted. Stale entries can never cause a wrong delete — every
candidate loser whose winner came FROM THE INDEX is verified against the
live lake (point ``lookup`` of the incumbents + content-hash equality)
before its tombstone is written. A stale entry discovered during
verification is dropped from the index (an op='D' marker row — the index
itself is a tiny LSM) and the next live entry, or the minimal new doc,
becomes the incumbent; without the drop a stale minimum would shadow the
live incumbent forever and duplicate content would accumulate.
Verification cost is O(collision candidates), bounded by the run's
new-doc count (epoch-sized), never the lake.

State: ``_dedup_index/state.json`` (last processed manifest version + the
immutable shard count) written atomically AFTER the delete epoch commits.
A crash between delete and state write is safe: the rerun's change feed
shows the deleted docs as tombstones (dropped), and index segments are
content-addressed (idempotent overwrite). If compaction folded away the
epochs the change feed needs, the run raises the standard full-resync
error — rebuild by removing ``_dedup_index/`` and re-running (the next run
bootstraps from a full scan).

Index layout: ``seg-{sha1(content)}-s{shard:04d}.parquet`` with columns
(h1, h2, doc_id, op); append-only, op='D' rows drop earlier (hash, doc)
adds; readers resolve live entries per hash sorted by doc_id. Shard count
is fixed at index creation (persisted in state.json).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.dedup import content_hash_pair
from ..stages.exchange import exchange_group_map


def _index_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_dedup_index")


def _load_state(lake_dir: str) -> dict | None:
    p = os.path.join(_index_dir(lake_dir), "state.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _save_state(lake_dir: str, state: dict) -> None:
    p = os.path.join(_index_dir(lake_dir), "state.json")
    tmp = p + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, p)


def _write_segment(idx_dir: str, shard: int, df: pd.DataFrame) -> str:
    """Content-addressed index segment (columns h1, h2, doc_id, op): a task
    retry overwrites the same file with the same bytes."""
    t = pa.table({
        "h1": pa.array(df["h1"].to_numpy(dtype=np.int64)),
        "h2": pa.array(df["h2"].to_numpy(dtype=np.int64)),
        "doc_id": pa.array(df["doc_id"].astype(str).tolist(), pa.string()),
        "op": pa.array(df["op"].astype(str).tolist(), pa.string()),
    })
    name = hashlib.sha1("\x00".join(
        sorted(df["doc_id"].astype(str) + ":" + df["op"].astype(str))
    ).encode()).hexdigest()[:20]
    final = os.path.join(idx_dir, f"seg-{name}-s{shard:04d}.parquet")
    tmp = final + f".tmp-{os.getpid()}"
    pq.write_table(t, tmp)
    os.rename(tmp, final)
    return final


def _read_shard_index(idx_dir: str, shard: int) -> pd.DataFrame:
    """Live index entries of one shard: adds minus op='D' drops, one row per
    (h1, h2, doc_id)."""
    paths = sorted(glob.glob(os.path.join(idx_dir, f"seg-*-s{shard:04d}.parquet")))
    empty = pd.DataFrame({"h1": pd.Series([], dtype="int64"),
                          "h2": pd.Series([], dtype="int64"),
                          "doc_id": pd.Series([], dtype="string")})
    if not paths:
        return empty
    df = pa.concat_tables([pq.read_table(p) for p in paths]).to_pandas()
    dropped = df[df["op"] == "D"][["h1", "h2", "doc_id"]]
    live = df[df["op"] == "A"][["h1", "h2", "doc_id"]].drop_duplicates()
    if len(dropped):
        live = live.merge(dropped.drop_duplicates(), how="left",
                          indicator=True, on=["h1", "h2", "doc_id"])
        live = live[live["_merge"] == "left_only"].drop(columns="_merge")
    return live if len(live) else empty


def compact_index(lake_dir: str, min_segments: int = 2) -> dict[str, Any]:
    """Fold each index shard's segment pile into ONE segment holding only
    live entries (adds minus drops) — segments otherwise accumulate one per
    dedup run. One Ray task per shard over ``min_segments`` (each reads only
    its own shard's files). Single-maintainer discipline, like ``compact``:
    don't run concurrently with a dedup run on the same lake."""
    import ray

    idx_dir = _index_dir(lake_dir)
    state = _load_state(lake_dir)
    if state is None:
        return {"compacted_shards": 0, "removed_segments": 0}
    num_shards = int(state["num_shards"])

    @ray.remote
    def fold(shard: int) -> int:
        paths = sorted(glob.glob(
            os.path.join(idx_dir, f"seg-*-s{shard:04d}.parquet")))
        if len(paths) < min_segments:
            return 0
        live = _read_shard_index(idx_dir, shard)
        keep = None
        if len(live):
            live = live.copy()
            live["op"] = "A"
            keep = _write_segment(idx_dir, shard, live)
        for p in paths:
            if p != keep:
                os.remove(p)
        return len(paths) - (1 if keep else 0)

    removed = ray.get([fold.remote(s) for s in range(num_shards)])
    return {"compacted_shards": int(sum(1 for r in removed if r)),
            "removed_segments": int(sum(removed))}


def dedup_incremental(engine, content_col: str = "tokens",
                      num_shards: int = 64,
                      compact_over: int = 8) -> dict[str, Any]:
    """One incremental dedup run over ``engine``'s lake. See module doc."""
    lake = engine.lake_dir
    idx_dir = _index_dir(lake)
    os.makedirs(idx_dir, exist_ok=True)
    state = _load_state(lake)
    if state is not None:
        num_shards = int(state["num_shards"])  # immutable once created

    # -- the new-doc set: full scan on bootstrap, net change set after -----
    if state is None:
        new = engine.scan(columns=["doc_id", content_col])
    else:
        feed = engine.changes(int(state["version"]), collapsed=True)

        def live_only(t: pa.Table) -> pa.Table:
            t = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
            return t.select(["doc_id", content_col])

        new = feed.map_batches(live_only, batch_format="pyarrow",
                               zero_copy_batch=True)

    # -- phase A: hash, shard, resolve against the shard's index -----------
    def tag(t: pa.Table) -> pa.Table:
        h1, h2 = content_hash_pair(t[content_col])
        shard = (h1.view(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.string()),
            "h1": pa.array(h1), "h2": pa.array(h2), "shard": pa.array(shard),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        """Per index shard: split the shard's new docs into definite losers
        (in-batch dups of a live winner), unverified candidates (their hash
        is indexed — all of that hash's index entries ride along for the
        driver's liveness walk), and appends (new hashes — the winner goes
        into the index HERE, distributed)."""
        shard = int(g["shard"].iloc[0])
        idx = _read_shard_index(idx_dir, shard)
        incs = (idx.sort_values("doc_id")
                .groupby(["h1", "h2"], sort=False)["doc_id"]
                .agg(lambda s: list(s)).rename("_incs").reset_index())
        g = g.sort_values(["h1", "h2", "doc_id"], kind="mergesort")
        g = g.merge(incs, on=["h1", "h2"], how="left")
        first = ~g.duplicated(["h1", "h2"])  # min new doc per hash
        has_inc = g["_incs"].notna()
        # new-hash winners → append to the index now
        appends = g[first & ~has_inc].copy()
        if len(appends):
            appends["op"] = "A"
            _write_segment(idx_dir, shard, appends[["h1", "h2", "doc_id", "op"]])
        # in-batch losers of a new-hash winner: winner is live by
        # construction → no verification needed
        win = g.groupby(["h1", "h2"], sort=False)["doc_id"].transform("min")
        sure = ~has_inc & ~first
        cand = has_inc
        empty_lists = pd.Series([[]] * int(sure.sum()), dtype=object,
                                index=g.index[sure])
        return pd.DataFrame({
            "doc_id": pd.concat([g.loc[sure, "doc_id"],
                                 g.loc[cand, "doc_id"]]).astype("string").values,
            "dup_of": pd.concat([win[sure],
                                 win[cand]]).astype("string").values,
            "h1": pd.concat([g.loc[sure, "h1"],
                             g.loc[cand, "h1"]]).to_numpy(dtype=np.int64),
            "h2": pd.concat([g.loc[sure, "h2"],
                             g.loc[cand, "h2"]]).to_numpy(dtype=np.int64),
            "incs": pd.concat([empty_lists, g.loc[cand, "_incs"]]).values,
            "verified": np.r_[np.ones(int(sure.sum()), dtype=bool),
                              np.zeros(int(cand.sum()), dtype=bool)],
        })

    tagged = new.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    cand = exchange_group_map(tagged, resolve, num_shards,
                              shard_col="shard").to_pandas()

    # -- phase B: verify index incumbents against the live lake ------------
    # candidate volume is bounded by the run's new docs (epoch-sized), so
    # driver-side resolution here is O(new dups), never O(lake)
    losers: list[str] = []
    if len(cand):
        sure = cand[cand["verified"]]
        losers.extend(sure["doc_id"])
    unverified = cand[~cand["verified"]] if len(cand) else cand
    if len(unverified):
        incumbents = sorted({d for lst in unverified["incs"] for d in lst})
        cur = engine.lookup(incumbents, columns=["doc_id", content_col])
        live: dict[str, tuple[int, int]] = {}
        if cur.num_rows:
            ch1, ch2 = content_hash_pair(cur[content_col])
            for d, x, y in zip(cur["doc_id"].to_pylist(), ch1, ch2):
                live[d] = (int(x), int(y))
        for (h1, h2), grp in unverified.groupby(["h1", "h2"]):
            entries = sorted({d for lst in grp["incs"] for d in lst})
            matching = [d for d in entries if live.get(d) == (int(h1), int(h2))]
            stale = [d for d in entries if d not in matching]
            shard = int(np.uint64(np.int64(h1)) % np.uint64(num_shards))
            if stale:  # drop: a stale minimum must not shadow the live one
                _write_segment(idx_dir, shard, pd.DataFrame(
                    {"h1": h1, "h2": h2, "doc_id": stale, "op": "D"}))
            docs = sorted(grp["doc_id"])
            if matching:
                winner = matching[0]
                losers.extend(d for d in docs if d != winner)
            else:
                # no live incumbent: the minimal new doc takes over
                winner = docs[0]
                _write_segment(idx_dir, shard, pd.DataFrame(
                    {"h1": [h1], "h2": [h2], "doc_id": [winner], "op": "A"}))
                losers.extend(docs[1:])

    # -- phase C: tombstone losers through the ordinary delete epoch -------
    out: dict[str, Any] = {"deleted": 0}
    if losers:
        out = engine.delete_where(doc_ids=sorted(set(losers)))
    out.update({
        "method": "incremental",
        "bootstrap": state is None,
        "candidates": int(len(cand)),
        "num_shards": num_shards,
    })
    _save_state(lake, {"version": engine.manifest.version,
                       "num_shards": num_shards})
    # bound the per-shard segment pile: one segment lands per run, so past
    # the threshold fold each hot shard back to a single live segment
    if compact_over:
        per_shard: dict[str, int] = {}
        for p in glob.glob(os.path.join(idx_dir, "seg-*.parquet")):
            sfx = p.rsplit("-s", 1)[-1]
            per_shard[sfx] = per_shard.get(sfx, 0) + 1
        if per_shard and max(per_shard.values()) > compact_over:
            out["index_compaction"] = compact_index(lake,
                                                    min_segments=compact_over)
    return out
