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

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


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
        BruteForceScorer,
        fn_constructor_args=(ref, k, emb_col, key_col, exclude_self),
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
        zero_copy_batch=True,
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", key_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")


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
) -> rd.Dataset:
    """Bucketed ANN: corpus rows route to their LSH bucket; each query scans
    only its own bucket (single-probe; recall < brute force by design).
    Bucket assignment is one map_batches; the join of queries to buckets is a
    broadcast (queries are small)."""
    q_mat = np.stack(queries[emb_col].to_numpy()).astype(np.float64)
    dim = q_mat.shape[1]
    bucketer = LSHBucketer(dim, n_planes, seed)
    q_buckets = bucketer.bucket(q_mat)
    q_by_bucket: dict[int, list[int]] = {}
    for qid, b in zip(queries[key_col].to_numpy(), q_buckets):
        q_by_bucket.setdefault(int(b), []).append(qid)
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

    cand = ds.map_batches(BucketScan, batch_format="pyarrow", batch_size=8192,
                          concurrency=(1, 4), zero_copy_batch=True)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", key_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return cand.groupby("query_id").map_groups(final_topk, batch_format="pandas")
