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
    ds: rd.Dataset, content_col: str = "text", key_col: str = "doc_id",
    num_shards: int = 64,
) -> rd.Dataset:
    """Keep, per distinct content value, the row with the smallest key.

    hash-partition + per-group first (SURVEY.md "Beyond the reference"):
    content hash computed per batch (vectorized) with a per-batch partial
    collapse (the combiner — duplicates inside a batch never reach the
    shuffle), then ONE groupby on hash SHARDS with a vectorized in-shard
    resolution (pandas groupby over the whole shard — per-hash map_groups
    would pay Ray per-group overhead × #distinct values). True content
    equality splits 64-bit collisions. Returns (key_col, n_copies).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _stable_hash(df[content_col].to_numpy()).astype(np.int64)
        df = pd.DataFrame({key_col: df[key_col].to_numpy(), content_col: df[content_col].to_numpy(), "_h": h})
        agg = df.groupby(["_h", content_col], sort=False)[key_col].agg(["min", "size"]).reset_index()
        agg = agg.rename(columns={"min": key_col, "size": "n_copies"})
        agg["shard"] = (agg["_h"].to_numpy().astype(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        return agg

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["_h", content_col], sort=False).agg(
            **{key_col: (key_col, "min"), "n_copies": ("n_copies", "sum")}
        ).reset_index()
        return pd.DataFrame(
            {key_col: agg[key_col].values, "n_copies": agg["n_copies"].astype("int64").values}
        )

    partials = ds.map_batches(partial, batch_format="pandas", zero_copy_batch=True)
    return partials.groupby("shard").map_groups(resolve, batch_format="pandas")


# --- shingles + MinHash -----------------------------------------------------

class MinHasher:
    """Batch-vectorized word-shingle MinHash signatures (n_perm universal
    hashes).

    Stateful: permutation coefficients generated once per actor from a fixed
    seed. The whole batch's tokens are hashed in ONE ``pd.util.hash_array``
    call; k-gram shingle hashes are a fixed-k sum of mixed token hashes over
    a flat window-start index (no per-doc Python loop, no string joins); the
    minhash is a ``np.minimum.reduceat`` over per-doc window offsets,
    chunked over permutations to bound the (windows × perms) temporary.
    """

    def __init__(self, text_col="text", key_col="doc_id", k=3, n_perm=64, seed=7):
        self.text_col, self.key_col, self.k, self.n_perm = text_col, key_col, k, n_perm
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64).astype(np.uint64)
        # odd per-position constants: shingle hash = Σ_j h[i+j] * kmix[j]
        self.kmix = (rng.integers(0, 1 << 62, size=k, dtype=np.int64).astype(np.uint64) << 1) | 1

    def batch_signatures(self, texts: list[str]) -> np.ndarray:
        k = self.k
        tok_lists = [t.lower().split() for t in texts]
        flat: list[str] = []
        lens = np.empty(len(tok_lists), dtype=np.int64)
        for i, toks in enumerate(tok_lists):
            flat.extend(toks)
            if len(toks) < k:  # pad short docs so every doc has ≥1 window
                flat.extend([""] * (k - len(toks)))
                lens[i] = k
            else:
                lens[i] = len(toks)
        h = pd.util.hash_array(np.array(flat, dtype=object), categorize=False)  # uint64
        n_win = lens - k + 1
        doc_off = np.concatenate(([0], np.cumsum(lens)))[:-1]
        total = int(n_win.sum())
        # global window-start indices, never crossing doc boundaries
        starts = np.repeat(doc_off, n_win) + (
            np.arange(total) - np.repeat(np.cumsum(n_win) - n_win, n_win)
        )
        shingle = np.zeros(total, dtype=np.uint64)
        for j in range(k):
            shingle += h[starts + j] * self.kmix[j]  # wraparound mixing
        win_off = np.concatenate(([0], np.cumsum(n_win)))[:-1]
        sig = np.empty((len(tok_lists), self.n_perm), dtype=np.uint64)
        step = max(1, (4 << 20) // max(total, 1))  # ~32MB temp per chunk
        for c in range(0, self.n_perm, step):
            v = (shingle[:, None] * self.a[None, c : c + step]
                 + self.b[None, c : c + step]) % np.uint64(_MERSENNE)
            sig[:, c : c + step] = np.minimum.reduceat(v, win_off, axis=0)
        return sig

    def signature(self, text: str) -> np.ndarray:
        return self.batch_signatures([text])[0]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sig = self.batch_signatures(df[self.text_col].astype(str).tolist()).astype(np.int64)
        out = df[[self.key_col]].copy()
        # bytes, not ndarray-object: stays a plain binary Arrow column through
        # the shuffle instead of per-row pickled objects
        out["sig"] = [row.tobytes() for row in sig]
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
    concurrency=(1, 8),
    num_shards: int = 64,
) -> rd.Dataset:
    """MinHash+LSH near-dup: shingle→minhash→band→bucket groupby→verify.

    A doc is a duplicate iff its bucket's min-key representative has
    signature-estimated Jaccard ≥ threshold (cluster-by-representative, the
    standard LSH dedup contraction). Returns (key_col, dup_of, est). The
    bucket shuffle carries only (band, bucket_hash, key, 8*n_perm B sig) per
    doc per band, never the documents. Verification is vectorized over whole
    bucket-hash SHARDS (``num_shards`` groups, each resolving all its
    buckets with numpy group-boundary math) — per-bucket ``map_groups``
    would pay Ray per-group overhead × (docs × bands) tiny groups.
    """
    rows = n_perm // bands
    rng = np.random.default_rng(104729)
    row_c = (rng.integers(0, 1 << 62, size=rows, dtype=np.int64).astype(np.uint64) << 1) | 1
    band_c = rng.integers(0, 1 << 62, size=bands, dtype=np.int64).astype(np.uint64)

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"shard": [], "band": [], "bucket": [], key_col: [], "sig": []})
        sig = np.frombuffer(b"".join(df["sig"]), dtype=np.int64).reshape(n, -1).astype(np.uint64)
        chunks = sig.reshape(n, bands, rows)
        mixed = np.bitwise_xor.reduce(chunks * row_c[None, None, :], axis=2) + band_c[None, :]
        mixed ^= mixed >> 33
        mixed *= np.uint64(0xFF51AFD7ED558CCD)
        mixed ^= mixed >> 33
        bucket = (mixed & np.uint64((1 << 62) - 1)).astype(np.int64)
        return pd.DataFrame(
            {
                "shard": (bucket.reshape(-1) % num_shards).astype(np.int64),
                "band": np.tile(np.arange(bands, dtype=np.int64), n),
                "bucket": bucket.reshape(-1),
                key_col: np.repeat(df[key_col].to_numpy(), bands),
                "sig": np.repeat(df["sig"].to_numpy(), bands),
            }
        )

    def resolve_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: [], "dup_of": [], "est": []})
        g = g.sort_values(["band", "bucket", key_col], kind="mergesort").reset_index(drop=True)
        sig = np.frombuffer(b"".join(g["sig"]), dtype=np.int64).reshape(len(g), -1)
        band = g["band"].to_numpy()
        bucket = g["bucket"].to_numpy()
        new = np.r_[True, (np.diff(band) != 0) | (np.diff(bucket) != 0)]
        rep = np.flatnonzero(new)[np.cumsum(new) - 1]  # index of each row's bucket rep
        est = (sig == sig[rep]).mean(axis=1)
        mask = (est >= threshold) & (np.arange(len(g)) != rep)
        keys = g[key_col].to_numpy()
        return pd.DataFrame(
            {key_col: keys[mask], "dup_of": keys[rep[mask]], "est": est[mask]}
        )

    sigs = ds.map_batches(
        MinHasher, fn_constructor_args=(text_col, key_col, k, n_perm),
        batch_format="pandas", batch_size=1024, concurrency=concurrency,
    )
    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    cand = buckets.groupby("shard").map_groups(resolve_shard, batch_format="pandas")

    # a doc may be flagged in several bands — keep the smallest dup_of
    # (single-task final: the flagged set is ≪ the corpus)
    def dedup_flags(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "dup_of", "est"], kind="mergesort")
        return df.groupby(key_col, sort=False).head(1)[[key_col, "dup_of", "est"]]

    return cand.repartition(1).map_batches(dedup_flags, batch_format="pandas",
                                           batch_size=None)


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

    # associative (min-key, count) combine: per-batch partial then a
    # single-task final over ≤ #signatures × #blocks partial rows
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("simhash", sort=False)[key_col].agg(["min", "size"]).reset_index()
        return g.rename(columns={"min": key_col, "size": "n_copies"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("simhash", sort=False).agg(
            **{key_col: (key_col, "min"), "n_copies": ("n_copies", "sum")}
        ).reset_index()
        g["n_copies"] = g["n_copies"].astype("int64")
        return g[[key_col, "n_copies", "simhash"]]

    return sigs.map_batches(partial, batch_format="pandas").repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


# --- n-gram Jaccard verification -------------------------------------------

def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard — the verification kernel behind LSH
    candidates (used group-locally, never as an all-pairs driver loop)."""
    ta, tb = a.lower().split(), b.lower().split()
    sa = {" ".join(ta[i : i + k]) for i in range(max(len(ta) - k + 1, 1))}
    sb = {" ".join(tb[i : i + k]) for i in range(max(len(tb) - k + 1, 1))}
    inter = len(sa & sb)
    return inter / max(len(sa) + len(sb) - inter, 1)


def ngram_verified_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    candidate_margin: float = 0.7,
    **lsh_kw,
) -> rd.Dataset:
    """n-gram Jaccard dedup: MinHash-LSH generates candidates (with a looser
    signature threshold = threshold × candidate_margin), then each candidate
    pair is verified with the EXACT word-k-gram Jaccard. Only candidate
    pairs and their two texts are touched in verification — the corpus is
    never compared all-pairs. Candidate texts are fetched with a broadcast
    key-set filter; the pair set is collected driver-side (candidates ≪
    corpus; at 100 TB shard the pair list and broadcast per shard instead).
    Returns (key_col, dup_of, jaccard) for verified duplicates."""
    cand = minhash_lsh_dedup(
        ds, text_col=text_col, key_col=key_col, k=k,
        threshold=threshold * candidate_margin, **lsh_kw,
    ).to_pandas()
    if len(cand) == 0:
        empty = pa.table({key_col: pa.array([], pa.int64()),
                          "dup_of": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        return rd.from_arrow(empty)
    from ..stages.joins import semi_join_filter

    keys = set(cand[key_col]) | set(cand["dup_of"])
    texts = semi_join_filter(ds, keys, on=key_col).to_pandas()
    lookup = dict(zip(texts[key_col], texts[text_col]))
    jac = np.array(
        [ngram_jaccard(lookup[a], lookup[b], k=k)
         for a, b in zip(cand[key_col], cand["dup_of"])]
    )
    out = cand.loc[jac >= threshold, [key_col, "dup_of"]].copy()
    out["jaccard"] = jac[jac >= threshold]
    return rd.from_pandas(out.reset_index(drop=True))


def cluster_duplicates(
    pairs: rd.Dataset, key_col: str = "doc_id", dup_col: str = "dup_of"
) -> rd.Dataset:
    """Transitive duplicate clusters from candidate pairs: connected
    components with min-key representatives (a~b, b~c ⇒ {a,b,c} cluster to
    min). Pairs are the LSH output — orders of magnitude smaller than the
    corpus — so union-find runs in ONE task (path-compressed, vectorized
    lookups); for pair sets beyond one task, rounds of min-label
    propagation over a groupby converge in O(graph diameter) shuffles.
    Returns (key_col, cluster) for every node appearing in a pair."""

    def uf(df: pd.DataFrame) -> pd.DataFrame:
        a = df[key_col].to_numpy()
        b = df[dup_col].to_numpy()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for x, y in zip(a, b):
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by min: smaller key becomes the root
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
        nodes = sorted(set(a) | set(b))
        return pd.DataFrame({key_col: nodes, "cluster": [find(n) for n in nodes]})

    return pairs.repartition(1).map_batches(uf, batch_format="pandas", batch_size=None)


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
