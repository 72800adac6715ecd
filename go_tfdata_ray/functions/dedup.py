"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (100 TB): every variant is
  map_batches(signature, vectorized) → ONE groupby shuffle on a small
  signature/bucket key → per-group vectorized resolution,
so the all-to-all exchange moves signatures (bytes per doc), never the
documents themselves, except for exact dedup where the hash groupby carries
only (hash, doc_id) and the winner set is re-joined as a broadcast filter.

Determinism: all hashing is seeded/fixed (pandas siphash with its fixed key,
integer mixing constants) — no process-salted `hash()` anywhere, so retries
and reruns bucket identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_MERSENNE = (1 << 61) - 1


def _stable_hash(values: np.ndarray) -> np.ndarray:
    return pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)


# --- exact dedup ------------------------------------------------------------

def exact_dedup(
    ds: rd.Dataset, content_col: str = "text", key_col: str = "doc_id"
) -> rd.Dataset:
    """Keep, per distinct content value, the row with the smallest key.

    hash-partition + per-group first (SURVEY.md "Beyond the reference"):
    content hash computed per batch (vectorized), groupby on the 64-bit hash,
    group-local verification of true content equality guards collisions.
    Returns (key_col, n_copies) — survivors with their duplicate counts.
    """

    def add_hash(t: pa.Table) -> pa.Table:
        h = _stable_hash(t[content_col].to_numpy(zero_copy_only=False)).astype(np.int64)
        return t.select([key_col, content_col]).append_column("_h", pa.array(h))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        # same 64-bit hash; group by the true content to split collisions
        agg = g.groupby(content_col, sort=False)[key_col].agg(["min", "size"])
        return pd.DataFrame({key_col: agg["min"].values, "n_copies": agg["size"].astype("int64").values})

    sig = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    return sig.groupby("_h").map_groups(resolve, batch_format="pandas")


# --- shingles + MinHash -----------------------------------------------------

class MinHasher:
    """Per-batch word-shingle MinHash signatures (n_perm universal hashes).

    Stateful: permutation coefficients generated once per actor from a fixed
    seed. Shingling is a per-doc numpy op over the token array; the minhash
    itself is a vectorized (n_shingles × n_perm) min-reduce.
    """

    def __init__(self, text_col="text", key_col="doc_id", k=3, n_perm=64, seed=7):
        self.text_col, self.key_col, self.k, self.n_perm = text_col, key_col, k, n_perm
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)

    def shingle_hashes(self, text: str) -> np.ndarray:
        toks = text.lower().split()
        if len(toks) < self.k:
            toks = toks + [""] * (self.k - len(toks))
        sh = np.array([" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)],
                      dtype=object)
        return np.unique(pd.util.hash_array(sh, categorize=False))

    def signature(self, text: str) -> np.ndarray:
        sh = self.shingle_hashes(text)
        # universal hashing: min((a*x + b) mod p) per permutation
        v = (sh[:, None] * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return v.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = df[self.text_col].astype(str).map(self.signature)
        out = df[[self.key_col]].copy()
        out["sig"] = sigs.map(lambda s: s.astype(np.int64))
        return out


def jaccard_from_sigs(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def minhash_lsh_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 3,
    n_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    concurrency=(1, 4),
) -> rd.Dataset:
    """MinHash+LSH near-dup: shingle→minhash→band→bucket groupby→verify.

    A doc is a duplicate iff some bucket-mate with a smaller key has
    signature-estimated Jaccard ≥ threshold (deterministic min-key
    representative). Returns (key_col, is_dup, dup_of). The bucket shuffle
    carries only (band, bucket_hash, key, 8*n_perm B sig) per doc per band.
    """
    rows = n_perm // bands

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        recs = {"band": [], "bucket": [], key_col: [], "sig": []}
        for _, r in df.iterrows():
            sig = np.asarray(r["sig"], dtype=np.int64)
            for band in range(bands):
                chunk = sig[band * rows : (band + 1) * rows]
                bucket = int(pd.util.hash_array(chunk.astype(np.uint64)).sum() % (1 << 62))
                recs["band"].append(band)
                recs["bucket"].append(bucket)
                recs[key_col].append(r[key_col])
                recs["sig"].append(sig)
        return pd.DataFrame(recs)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({key_col: [], "dup_of": []})
        g = g.sort_values(key_col).reset_index(drop=True)
        sigs = np.stack(g["sig"].to_numpy())
        keys = g[key_col].to_numpy()
        out_k, out_d = [], []
        for i in range(1, len(g)):
            est = (sigs[:i] == sigs[i]).mean(axis=1)
            j = int(np.argmax(est))
            if est[j] >= threshold:
                out_k.append(keys[i])
                out_d.append(keys[j])
        return pd.DataFrame({key_col: out_k, "dup_of": out_d})

    sigs = ds.map_batches(
        MinHasher, fn_constructor_args=(text_col, key_col, k, n_perm),
        batch_format="pandas", batch_size=2048, concurrency=concurrency,
    )
    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    cand = buckets.groupby(["band", "bucket"]).map_groups(verify, batch_format="pandas")

    # a doc may be flagged in several bands — keep the smallest dup_of
    def dedup_flags(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("dup_of").head(1)

    return cand.groupby(key_col).map_groups(dedup_flags, batch_format="pandas")


# --- SimHash ----------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word hashes (sign-sum of per-token bit vectors),
    fully vectorized per doc."""

    def __init__(self, text_col="text", key_col="doc_id"):
        self.text_col, self.key_col = text_col, key_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = np.array(text.lower().split(), dtype=object)
        if len(toks) == 0:
            return 0
        h = pd.util.hash_array(toks, categorize=False)
        bitmat = ((h[:, None] & self.bits[None, :]) != 0).astype(np.int32)
        votes = bitmat.sum(axis=0) * 2 - len(toks)
        return int(((votes > 0).astype(np.uint64) * self.bits).sum(dtype=np.uint64))

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[[self.key_col]].copy()
        out["simhash"] = (
            df[self.text_col].astype(str).map(self.simhash).astype("uint64").astype("int64")
        )
        return out


def simhash_dedup(ds: rd.Dataset, text_col="text", key_col="doc_id", concurrency=(1, 4)) -> rd.Dataset:
    """Exact-simhash-match dedup: signature groupby keeps min key.
    (Hamming-distance banding would split the 64 bits into 4×16-bit bands
    and bucket per band — same shape as MinHash-LSH above.)"""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_args=(text_col, key_col),
        batch_format="pandas", batch_size=2048, concurrency=concurrency,
    )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {key_col: [g[key_col].min()], "n_copies": [np.int64(len(g))],
             "simhash": [g["simhash"].iloc[0]]}
        )

    return sigs.groupby("simhash").map_groups(resolve, batch_format="pandas")


# --- n-gram Jaccard verification -------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the verification kernel behind LSH
    candidates (used group-locally, never as an all-pairs driver loop)."""
    ta, tb = a.lower().split(), b.lower().split()
    sa = {" ".join(ta[i : i + k]) for i in range(max(len(ta) - k + 1, 1))}
    sb = {" ".join(tb[i : i + k]) for i in range(max(len(tb) - k + 1, 1))}
    inter = len(sa & sb)
    return inter / max(len(sa) + len(sb) - inter, 1)


# --- embedding cosine near-dup ----------------------------------------------

def embedding_neardup(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
) -> rd.Dataset:
    """Cosine near-dup via random-hyperplane LSH buckets + exact in-bucket
    cosine. Deterministic planes from a fixed seed; bucket = sign pattern.
    Near-identical vectors share all signs w.h.p.; at scale, multi-probe or
    repeated plane sets raise recall (documented tradeoff)."""

    def bucketize(t: pa.Table) -> pa.Table:
        emb = np.stack([np.asarray(x, dtype=np.float64) for x in t[emb_col].to_pylist()])
        dim = emb.shape[1]
        planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
        signs = (emb @ planes) > 0
        bucket = (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        unit = emb / np.clip(norm, 1e-12, None)
        return pa.table(
            {
                key_col: t[key_col],
                "bucket": pa.array(bucket),
                "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({key_col: [], "dup_of": [], "cos": []})
        g = g.sort_values(key_col).reset_index(drop=True)
        u = np.stack(g["unit"].to_numpy())
        keys = g[key_col].to_numpy()
        sims = u @ u.T
        out_k, out_d, out_c = [], [], []
        for i in range(1, len(g)):
            j = int(np.argmax(sims[i, :i]))
            if sims[i, j] >= threshold:
                out_k.append(keys[i]); out_d.append(keys[j]); out_c.append(float(sims[i, j]))
        return pd.DataFrame({key_col: out_k, "dup_of": out_d, "cos": out_c})

    buckets = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return buckets.groupby("bucket").map_groups(resolve, batch_format="pandas")
