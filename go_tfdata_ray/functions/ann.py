"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and read in each actor's ``__init__`` (never re-shipped per
batch); each batch does one float64 matmul and emits per-batch top-k
candidates; a final tiny reduce takes the global top-k. Data moves once
(read), candidates are k·queries rows per block.

Scale path: random-hyperplane LSH bucketing (same planes for corpus and
queries) so each query only scans its probe buckets — the candidate
generation becomes a bucket-key groupby instead of a full scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..stages.exchange import exchange_coalesce_map


# per-worker-process stage cache, keyed by the broadcast ref (unique per
# query invocation): plain tasks + this cache keep "state loads once per
# worker" semantics without a dedicated actor pool's ~1 s spin-up per
# query (same pattern as stages/joins._BCAST_CACHE / text._worker_cached).
# LRU-bounded: per-invocation keys would otherwise leak one deserialized
# query matrix per run into every long-lived worker.
_STATE_CACHE_MAX = 8
_STATE_CACHE: dict = {}  # insertion-ordered: oldest first


def _cached_stage(factory, key: str, name: str):
    def fn(batch):
        inst = _STATE_CACHE.get(key)
        if inst is None:
            inst = _STATE_CACHE.setdefault(key, factory())
            while len(_STATE_CACHE) > _STATE_CACHE_MAX:
                _STATE_CACHE.pop(next(iter(_STATE_CACHE)))
        return inst(batch)

    fn.__name__ = name
    return fn


def _to_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list/fixed-size-list/tensor-extension
    embedding column — zero-copy flatten+reshape where the layout allows."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = arr.offsets.to_numpy(zero_copy_only=False)
        width = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        return flat.reshape(len(arr), width)
    if isinstance(arr, pa.FixedSizeListArray):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(arr), arr.type.list_size)
    out = arr.to_numpy(zero_copy_only=False)  # e.g. Ray ArrowTensorArray
    if out.dtype == object:
        return np.stack(out).astype(np.float64)
    return np.asarray(out, dtype=np.float64).reshape(len(arr), -1)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


def _finalize_topk(cand: rd.Dataset, key_col: str, k: int, n_queries: int,
                   num_shards: int = 64) -> rd.Dataset:
    """Global top-k per query from per-batch partial candidates.

    Candidates are ≤ k × queries × blocks rows. With few queries a single
    coalesced combine task is the cheapest final (tree-reduce; Ray's
    groupby shuffle costs seconds of fixed overhead). At larger query
    counts the final output itself is O(k × Q) — unbounded in Q — so the
    combine shards by query hash (groupby), keeping both the reduce and
    its output distributed."""

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["query_id", "score", key_col],
                            ascending=[True, False, True], kind="mergesort")
        df = df.groupby("query_id", sort=False).head(k).reset_index(drop=True)
        df["rank"] = (df.groupby("query_id", sort=False).cumcount() + 1).astype(np.int64)
        return df

    if n_queries < 256:
        return exchange_coalesce_map(cand, topk)

    def add_qshard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_qs"] = (
            pd.util.hash_array(df["query_id"].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return df

    def topk_shard(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df.drop(columns=["_qs"]))

    from ..stages.exchange import exchange_group_map

    return exchange_group_map(
        cand.map_batches(add_qshard, batch_format="pandas"),
        topk_shard, num_shards, shard_col="_qs",
    )


class BruteForceScorer:
    """Actor-pool stage: queries fetched from the object store once per
    actor; per batch one (B×dim)·(dim×Q) matmul + per-query top-k."""

    def __init__(self, queries_ref, k: int, emb_col: str, key_col: str, exclude_self: bool):
        q = ray.get(queries_ref)  # {"ids": np.ndarray, "mat": np.ndarray}
        self.q_ids = q["ids"]
        self.q = _unit(q["mat"]).T  # dim × Q
        self.k, self.emb_col, self.key_col = k, emb_col, key_col
        self.exclude_self = exclude_self

    def __call__(self, t: pa.Table) -> pa.Table:
        emb = _unit(_to_matrix(t[self.emb_col]))
        ids = t[self.key_col].to_numpy(zero_copy_only=False)
        sims = emb @ self.q  # B × Q
        if self.exclude_self:
            sims[ids[:, None] == self.q_ids[None, :]] = -np.inf
        k = min(self.k, sims.shape[0])
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # k × Q
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            rows = top[:, qi]
            out_q.append(np.full(len(rows), self.q_ids[qi]))
            out_id.append(ids[rows])
            out_s.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.key_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def brute_force_topk(
    ds: rd.Dataset,
    queries: pa.Table | pd.DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    exclude_self: bool = True,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Global cosine top-k per query. Deterministic tie-break by key.
    Returns (query_id, key_col, score) with exactly k rows per query."""
    if isinstance(queries, pd.DataFrame):
        q_ids = queries[key_col].to_numpy()
        q_mat = np.stack(queries[emb_col].to_numpy()).astype(np.float64)
    else:
        q_ids = queries[key_col].to_numpy(zero_copy_only=False)
        q_mat = _to_matrix(queries[emb_col])
    ref = ray.put({"ids": q_ids, "mat": q_mat})

    cand = ds.map_batches(
        _cached_stage(lambda: BruteForceScorer(ref, k, emb_col, key_col, exclude_self),
                      ref.hex(), "BruteForceScorer"),
        batch_format="pyarrow",
        batch_size=8192,
        zero_copy_batch=True,
    )

    return _finalize_topk(cand, key_col, k, len(q_ids))


def _train_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 29
) -> np.ndarray:
    """Tiny spherical k-means on a driver-side sample (deterministic seeded
    init). The trained coarse quantizer is broadcast once — at 100 TB the
    sample stays a few thousand rows; training cost is O(sample × centroids)
    regardless of corpus size."""
    unit = _unit(sample)
    n_centroids = min(n_centroids, len(unit))
    rng = np.random.default_rng(seed)
    cent = unit[rng.choice(len(unit), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(unit @ cent.T, axis=1)
        for c in range(n_centroids):
            rows = unit[assign == c]
            if len(rows):
                cent[c] = rows.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_topk(
    ds: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 4096,
    seed: int = 29,
    concurrency=(1, 8),
) -> rd.Dataset:
    """IVF ANN: a coarse quantizer (spherical k-means, trained once on a
    sample, broadcast via ray.put) routes corpus rows to inverted lists;
    each query scans only its ``n_probe`` nearest centroids' lists. Recall
    grows with n_probe (n_probe = n_centroids ⇒ exact). The corpus is read
    once; candidate volume is the probed fraction of each batch."""
    sample = _to_matrix(
        pa.concat_tables(
            [b for b in ds.limit(sample_size).iter_batches(
                batch_size=sample_size, batch_format="pyarrow")]
        )[emb_col]
    )
    cent = _train_centroids(sample, n_centroids, seed=seed)
    q_ids = queries[key_col].to_numpy()
    q_unit = _unit(np.stack(queries[emb_col].to_numpy()).astype(np.float64))
    n_probe = min(n_probe, len(cent))
    q_probes = np.argsort(-(q_unit @ cent.T), axis=1)[:, :n_probe]  # Q × n_probe
    # centroid -> indices of queries probing it
    probing: dict[int, np.ndarray] = {
        int(c): np.flatnonzero((q_probes == c).any(axis=1)) for c in np.unique(q_probes)
    }
    ref = ray.put({"cent": cent, "q_ids": q_ids, "q_unit": q_unit, "probing": probing})

    class IVFScan:
        def __init__(self):
            s = ray.get(ref)
            self.cent, self.q_ids = s["cent"], s["q_ids"]
            self.q_unit, self.probing = s["q_unit"], s["probing"]

        def __call__(self, t: pa.Table) -> pa.Table:
            unit = _unit(_to_matrix(t[emb_col]))
            ids = t[key_col].to_numpy(zero_copy_only=False)
            assign = np.argmax(unit @ self.cent.T, axis=1)
            out_q, out_id, out_s = [], [], []
            for c in np.unique(assign):
                q_rows = self.probing.get(int(c))
                if q_rows is None or not len(q_rows):
                    continue
                rows = assign == c
                sub_ids, sub = ids[rows], unit[rows]
                sims = sub @ self.q_unit[q_rows].T  # |list| × |probing queries|
                for j, qi in enumerate(q_rows):
                    qid = self.q_ids[qi]
                    mask = sub_ids != qid
                    out_q.append(np.full(int(mask.sum()), qid))
                    out_id.append(sub_ids[mask])
                    out_s.append(sims[mask, j])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 key_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    key_col: pa.array(np.concatenate(out_id)),
                    "score": pa.array(np.concatenate(out_s)),
                }
            )

    cand = ds.map_batches(_cached_stage(IVFScan, ref.hex(), "IVFScan"),
                          batch_format="pyarrow", batch_size=8192,
                          zero_copy_batch=True)

    return _finalize_topk(cand, key_col, k, len(q_ids))


class LSHBucketer:
    """Shared random-hyperplane signatures for the IVF/LSH scale path."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 23):
        self.planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
        self.weights = 1 << np.arange(n_planes)

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        return (((mat @ self.planes) > 0) * self.weights).sum(axis=1).astype(np.int64)


def lsh_topk(
    ds: rd.Dataset,
    queries: pd.DataFrame,
    k: int = 10,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    n_planes: int = 8,
    seed: int = 23,
    probe_flips: int = 1,
) -> rd.Dataset:
    """Bucketed ANN with MULTI-PROBE: corpus rows route to their LSH bucket
    once; each query scans its own bucket plus every bucket within
    ``probe_flips`` sign flips of its code (Hamming ball — the standard
    multi-probe recall recovery: a near neighbor differs in few plane
    signs). probe_flips=0 is single-probe; 1 probes 1+n_planes buckets per
    query. Candidate volume stays the probed fraction of the corpus —
    corpus vectors are never replicated. Bucket assignment is one
    map_batches; queries are broadcast."""
    q_mat = np.stack(queries[emb_col].to_numpy()).astype(np.float64)
    dim = q_mat.shape[1]
    bucketer = LSHBucketer(dim, n_planes, seed)
    q_buckets = bucketer.bucket(q_mat)
    q_by_bucket: dict[int, list[int]] = {}
    for qid, b in zip(queries[key_col].to_numpy(), q_buckets):
        codes = {int(b)}
        if probe_flips >= 1:
            codes |= {int(b) ^ (1 << i) for i in range(n_planes)}
        if probe_flips >= 2:
            codes |= {int(b) ^ (1 << i) ^ (1 << j)
                      for i in range(n_planes) for j in range(i + 1, n_planes)}
        for c in codes:
            q_by_bucket.setdefault(c, []).append(qid)
    q_unit = _unit(q_mat)
    q_index = {int(qid): i for i, qid in enumerate(queries[key_col].to_numpy())}
    ref = ray.put((q_by_bucket, q_unit, q_index))

    class BucketScan:
        def __init__(self):
            self.q_by_bucket, self.q_unit, self.q_index = ray.get(ref)
            self.bucketer = LSHBucketer(dim, n_planes, seed)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = _to_matrix(t[emb_col])
            buckets = self.bucketer.bucket(emb)
            ids = t[key_col].to_numpy(zero_copy_only=False)
            unit = _unit(emb)
            out_q, out_id, out_s = [], [], []
            for b in np.unique(buckets):
                qids = self.q_by_bucket.get(int(b))
                if not qids:
                    continue
                rows = buckets == b
                sub_ids, sub = ids[rows], unit[rows]
                for qid in qids:
                    sims = sub @ self.q_unit[self.q_index[qid]]
                    mask = sub_ids != qid
                    out_q.append(np.full(mask.sum(), qid))
                    out_id.append(sub_ids[mask])
                    out_s.append(sims[mask])
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 key_col: pa.array([], pa.int64()),
                                 "score": pa.array([], pa.float64())})
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    key_col: pa.array(np.concatenate(out_id)),
                    "score": pa.array(np.concatenate(out_s)),
                }
            )

    cand = ds.map_batches(_cached_stage(BucketScan, ref.hex(), "BucketScan"),
                          batch_format="pyarrow", batch_size=8192,
                          zero_copy_batch=True)

    return _finalize_topk(cand, key_col, k, len(queries))
