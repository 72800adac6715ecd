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

from .text import _worker_cached
from ..stages.exchange import exchange_coalesce_map, exchange_group_map

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
    a 128-BIT content hash (two independent fixed-key siphashes) is the sole
    shuffle key — the document text itself NEVER crosses the wire; at 100 TB
    the groupby moves ~32 B/doc, not the corpus. Per-batch partial collapse
    (the combiner — duplicates inside a batch never reach the shuffle), then
    ONE groupby on hash SHARDS with a vectorized in-shard resolution (pandas
    groupby over the whole shard — per-hash map_groups would pay Ray
    per-group overhead × #distinct values). 128-bit collisions are below
    2^-64 per pair; paranoid deployments can re-verify winners with a
    broadcast key-set fetch. Returns (key_col, n_copies).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # the ONE content-identity kernel (shared with dedup_lake and the
        # persisted incremental index — drift here would silently desync
        # identities across the persisted index)
        h1, h2 = content_hash_pair(pa.Array.from_pandas(df[content_col]))
        df = pd.DataFrame({key_col: df[key_col].to_numpy(), "_h1": h1, "_h2": h2})
        agg = df.groupby(["_h1", "_h2"], sort=False)[key_col].agg(["min", "size"]).reset_index()
        agg = agg.rename(columns={"min": key_col, "size": "n_copies"})
        agg["shard"] = (agg["_h1"].to_numpy().astype(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        return agg

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["_h1", "_h2"], sort=False).agg(
            **{key_col: (key_col, "min"), "n_copies": ("n_copies", "sum")}
        ).reset_index()
        return pd.DataFrame(
            {key_col: agg[key_col].values, "n_copies": agg["n_copies"].astype("int64").values}
        )

    partials = ds.map_batches(partial, batch_format="pandas", zero_copy_batch=True)
    return exchange_group_map(partials, resolve, num_shards, shard_col="shard")


_SPLITMIX_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public-domain constants): bijective 64-bit
    avalanche, vectorized with wraparound uint64 arithmetic."""
    x = x.astype(np.uint64, copy=True)
    x += _SPLITMIX_GOLDEN
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hash_list_column(col: pa.ChunkedArray | pa.Array, salt: int = 0) -> np.ndarray:
    """Order- AND length-sensitive 64-bit content hash per list<int> row.

    Why not ``pd.util.hash_array`` over the object column: pandas falls back
    to ``str()`` for unhashable cells, and ``str(np.ndarray)`` TRUNCATES long
    arrays ("[1 2 3 ... 9]") — distinct token arrays would collide. This
    kernel is one vectorized pass over the FLATTENED values: each element is
    mixed with its local position (XOR alone would be permutation-
    insensitive), XOR-reduced per row via ``np.bitwise_xor.reduceat``, then
    mixed with the row length. Inner nulls hash as the -1 sentinel; null
    rows hash to a constant distinct from the empty list. Two calls with
    different salts give independent 64-bit halves of a 128-bit hash."""
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    out = np.empty(len(col), dtype=np.uint64)
    s = np.uint64(salt)
    base = 0
    for chunk in chunks:
        m = len(chunk)
        if m == 0:
            continue
        null_rows = np.asarray(pc.is_null(chunk))
        counts = pc.fill_null(pc.list_value_length(chunk), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(chunk)
        if flat.null_count:
            flat = pc.fill_null(flat, -1)
        raw = flat.to_numpy(zero_copy_only=False)
        if raw.dtype.kind == "f":
            # float lists (e.g. embeddings): hash the BIT PATTERN —
            # astype(int64) would truncate 0.1 and 0.2 both to 0
            vals = (raw.view(np.uint64) if raw.dtype == np.float64
                    else raw.astype(np.float64).view(np.uint64))
        else:
            vals = raw.astype(np.int64).view(np.uint64)
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = (np.arange(len(vals), dtype=np.int64)
               - np.repeat(starts, counts)).view(np.uint64)
        elem = _mix64(vals ^ _mix64(pos + s))
        seg = np.zeros(m, dtype=np.uint64)
        valid = counts > 0
        if valid.any():
            # strictly increasing starts (count>0 rows only): reduceat's
            # i-th reduce spans exactly row i's elements — empty rows in
            # between contribute nothing and keep seg=0
            seg[valid] = np.bitwise_xor.reduceat(elem, starts[valid])
        row = _mix64(seg ^ _mix64(counts.view(np.uint64) + s + np.uint64(1)))
        if null_rows.any():
            row[null_rows] = _mix64(
                np.full(int(null_rows.sum()), np.uint64(0xDEADBEEF) + s))
        out[base:base + m] = row
        base += m
    return out


def content_hash_pair(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """128-bit content hash as two independent int64 halves: segment hash
    for list<int> columns (``hash_list_column``), siphash pair for strings.
    The shared identity kernel for exact dedup / the incremental index."""
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        return (hash_list_column(col, salt=0xA5).view(np.int64),
                hash_list_column(col, salt=0x5C).view(np.int64))
    vals = col.to_numpy(zero_copy_only=False)
    h1 = _stable_hash(vals).astype(np.int64)
    h2 = pd.util.hash_array(
        np.asarray(vals, dtype=object), categorize=False,
        hash_key="beefcafe0badf00d",
    ).astype(np.int64)
    return h1, h2


def duplicate_keys(
    ds: rd.Dataset, content_col: str = "tokens", key_col: str = "doc_id",
    num_shards: int = 64,
) -> rd.Dataset:
    """Enumerate exact content duplicates: one output row per LOSING key —
    ``(key_col, dup_of, n_copies)`` where ``dup_of`` is the group's winner
    (smallest key) and ``n_copies`` the group size. The complement of
    ``exact_dedup`` (which returns winners): feed the losers to a delete
    sink (``CDCEngine.dedup_lake`` tombstones them through the CDC path).

    Content may be a string column (siphash pair, as in ``exact_dedup``) or
    a list<int> column — token arrays hash via ``hash_list_column`` (a
    str()-fallback would truncate and collide). Scale shape: the shuffle
    carries one (16 B hash, key) row per doc — the honest lower bound for
    enumerating losers; content never crosses the wire. Upstream keys are
    unique (a keyed table / the lake scan), so there is nothing for a
    per-batch combiner to collapse."""

    def tag(t: pa.Table) -> pa.Table:
        h1, h2 = content_hash_pair(t[content_col])
        shard = (h1.view(np.uint64) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({
            key_col: pc.cast(t[key_col], pa.string()),
            "_h1": pa.array(h1), "_h2": pa.array(h2),
            "shard": pa.array(shard),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        grp = g.groupby(["_h1", "_h2"], sort=False)[key_col]
        win = grp.transform("min")
        size = grp.transform("size")
        losers = (size > 1) & (g[key_col] != win)
        # explicit dtypes: an all-empty shard output must not poison the
        # Dataset schema (empty object columns convert to arrow null)
        return pd.DataFrame({
            key_col: g.loc[losers, key_col].astype("string").values,
            "dup_of": win[losers].astype("string").values,
            "n_copies": size[losers].to_numpy(dtype=np.int64),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return exchange_group_map(tagged, resolve, num_shards, shard_col="shard")


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
        return self._sigs_from_hashes(h, lens)

    def _sigs_from_hashes(self, h: np.ndarray, lens: np.ndarray) -> np.ndarray:
        """Windowed-minimum core: per-doc k-gram shingle hashes over the
        flat element-hash array ``h`` (doc boundaries from ``lens``, every
        len ≥ k), then the n_perm permutation minima."""
        k = self.k
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
        sig = np.empty((len(lens), self.n_perm), dtype=np.uint64)
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


class TokenMinHasher(MinHasher):
    """MinHash over k-grams of INT TOKEN IDS — the pre-tokenized lake's
    native content (north-rule input shape: ``tokens: list<int32>``). Same
    windowed-minimum core as :class:`MinHasher`; element hashes come from a
    splitmix64 mix of the ids, so no string materialization happens. Short
    docs pad with a sentinel below the token-id space so every doc has ≥1
    window. Constructor signature matches MinHasher (``text_col`` names the
    list column) — a drop-in for ``minhash_lsh_dedup(hasher=...)``."""

    def batch_signatures(self, token_lists) -> np.ndarray:
        k = self.k
        parts = []
        for t in token_lists:  # per-doc append only; the concat is one C op
            a = np.asarray(t if t is not None else (), dtype=np.int64)
            if len(a) < k:
                a = np.concatenate([a, np.full(k - len(a), -(1 << 40), np.int64)])
            parts.append(a)
        if not parts:
            return np.empty((0, self.n_perm), dtype=np.uint64)
        flat = np.concatenate(parts)
        lens = np.fromiter((len(p) for p in parts), np.int64, len(parts))
        return self._sigs_from_hashes(_mix64(flat.view(np.uint64)), lens)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sig = self.batch_signatures(df[self.text_col].tolist()).astype(np.int64)
        out = df[[self.key_col]].copy()
        out["sig"] = [row.tobytes() for row in sig]
        return out


def jaccard_from_sigs(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


_BAND_CONST_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def _band_constants(bands: int, rows: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-(bands, rows) banding constants — drawn in the
    same order as the original inline math so existing bucket values are
    bit-identical."""
    key = (bands, rows)
    got = _BAND_CONST_CACHE.get(key)
    if got is None:
        rng = np.random.default_rng(104729)
        row_c = (rng.integers(0, 1 << 62, size=rows,
                              dtype=np.int64).astype(np.uint64) << 1) | 1
        band_c = rng.integers(0, 1 << 62, size=bands,
                              dtype=np.int64).astype(np.uint64)
        got = _BAND_CONST_CACHE[key] = (row_c, band_c)
    return got


def band_buckets(sig: np.ndarray, bands: int) -> np.ndarray:
    """(n, n_perm) uint64 signature matrix → (n, bands) int64 LSH bucket
    keys. The SHARED banding kernel of :func:`minhash_lsh_dedup` and the
    persisted near-dup index (``cdc/neardupidx.py``) — identical constants,
    so the two bucket spaces agree and an index built by one is probeable
    by the other. Band identity is folded into the bucket value via the
    per-band additive constant; a cross-band collision is merely a spurious
    candidate pair that signature verification filters."""
    n, n_perm = sig.shape
    if n_perm % bands:
        raise ValueError(f"n_perm={n_perm} not divisible by bands={bands}")
    rows = n_perm // bands
    row_c, band_c = _band_constants(bands, rows)
    chunks = sig.reshape(n, bands, rows)
    mixed = np.bitwise_xor.reduce(chunks * row_c[None, None, :], axis=2) + band_c[None, :]
    mixed ^= mixed >> np.uint64(33)
    mixed *= np.uint64(0xFF51AFD7ED558CCD)
    mixed ^= mixed >> np.uint64(33)
    return (mixed & np.uint64((1 << 62) - 1)).astype(np.int64)


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
    hasher: type = MinHasher,
) -> rd.Dataset:
    """MinHash+LSH near-dup: shingle→minhash→band→bucket groupby→verify.

    ``hasher`` picks the signature stage: :class:`MinHasher` (word shingles
    over a string column, the default) or :class:`TokenMinHasher` (k-grams
    over an int-token list column — the lake's native content).

    A doc is a duplicate iff its bucket's min-key representative has
    signature-estimated Jaccard ≥ threshold (cluster-by-representative, the
    standard LSH dedup contraction). Returns (key_col, dup_of, est). The
    bucket shuffle carries only (band, bucket_hash, key, 8*n_perm B sig) per
    doc per band, never the documents. Verification is vectorized over whole
    bucket-hash SHARDS (``num_shards`` groups, each resolving all its
    buckets with numpy group-boundary math) — per-bucket ``map_groups``
    would pay Ray per-group overhead × (docs × bands) tiny groups.
    """
    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"shard": [], "band": [], "bucket": [], key_col: [], "sig": []})
        sig = np.frombuffer(b"".join(df["sig"]), dtype=np.int64).reshape(n, -1).astype(np.uint64)
        bucket = band_buckets(sig, bands)
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
            return pd.DataFrame({key_col: [], "dup_of": [], "est": [],
                                 "_ks": pd.Series([], dtype="int64")})
        g = g.sort_values(["band", "bucket", key_col], kind="mergesort").reset_index(drop=True)
        sig = np.frombuffer(b"".join(g["sig"]), dtype=np.int64).reshape(len(g), -1)
        band = g["band"].to_numpy()
        bucket = g["bucket"].to_numpy()
        new = np.r_[True, (np.diff(band) != 0) | (np.diff(bucket) != 0)]
        rep = np.flatnonzero(new)[np.cumsum(new) - 1]  # index of each row's bucket rep
        est = (sig == sig[rep]).mean(axis=1)
        mask = (est >= threshold) & (np.arange(len(g)) != rep)
        keys = g[key_col].to_numpy()
        out = pd.DataFrame(
            {key_col: keys[mask], "dup_of": keys[rep[mask]], "est": est[mask]}
        )
        # key-shard for the flag-dedup exchange, emitted here to save a pass
        out["_ks"] = (
            _stable_hash(out[key_col].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return out

    # light state (permutation arrays) → worker-cached task, not actor pool
    sigs = ds.map_batches(
        _worker_cached(hasher, text_col, key_col, k, n_perm),
        batch_format="pandas", batch_size=1024,
    )
    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    cand = exchange_group_map(buckets, resolve_shard, num_shards, shard_col="shard")

    # a doc may be flagged in several bands — keep the smallest dup_of.
    # The flagged set is 10-40% of a web corpus, NOT tiny: the final is a
    # key-sharded exchange (distributed), never a single task.
    def flag_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "dup_of", "est"], kind="mergesort")
        return df.groupby(key_col, sort=False).head(1)[[key_col, "dup_of", "est"]]

    return exchange_group_map(cand, flag_shard, num_shards, shard_col="_ks")


# --- SimHash ----------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over word hashes (sign-sum of per-token bit vectors),
    vectorized across the WHOLE batch: one ``hash_array`` call for every
    token in the batch, bit expansion via ``np.unpackbits``, per-doc bit
    votes via a segment ``reduceat`` over flattened token offsets — the same
    flattened-offsets shape as ``MinHasher.batch_signatures``. No per-doc
    Python work beyond the tokenizing split."""

    def __init__(self, text_col="text", key_col="doc_id"):
        self.text_col, self.key_col = text_col, key_col
        self.bits = np.uint64(1) << np.arange(64, dtype=np.uint64)

    def batch_simhash(self, texts: list[str]) -> np.ndarray:
        tok_lists = [t.lower().split() for t in texts]
        lens = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                           count=len(tok_lists))
        flat = np.array([w for sub in tok_lists for w in sub], dtype=object)
        n_total = len(flat)
        if n_total == 0:
            return np.zeros(len(texts), dtype=np.uint64)
        h = pd.util.hash_array(flat, categorize=False)  # uint64
        # (n_total, 64) bit matrix; little-endian bit j == (h >> j) & 1
        bitmat = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1,
                               bitorder="little")
        offs = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        # reduceat quirks: an empty segment returns a[idx], and a trailing
        # empty doc's offset == n_total is out of bounds — append one zero
        # sentinel row (keeps all real boundaries exact) and zero empty docs
        padded = np.vstack([bitmat, np.zeros((1, 64), dtype=bitmat.dtype)])
        sums = np.add.reduceat(padded.astype(np.int32), offs, axis=0)
        sums[lens == 0] = 0
        votes = 2 * sums - lens[:, None]
        return ((votes > 0).astype(np.uint64) * self.bits[None, :]).sum(
            axis=1, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        return int(self.batch_simhash([text])[0])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df[[self.key_col]].copy()
        sig = self.batch_simhash(df[self.text_col].astype(str).tolist())
        out["simhash"] = sig.astype(np.int64)
        return out


def simhash_dedup(ds: rd.Dataset, text_col="text", key_col="doc_id",
                  concurrency=(1, 4), num_shards: int = 64) -> rd.Dataset:
    """Exact-simhash-match dedup: signature groupby keeps min key. For
    NEAR-dup detection via Hamming-banded buckets see
    ``simhash_banded_neardup``."""
    sigs = ds.map_batches(
        _worker_cached(SimHasher, text_col, key_col),
        batch_format="pandas", batch_size=2048,
    )

    # associative (min-key, count) combine: per-batch partial, then a
    # signature-sharded distributed final (#signatures ~ #docs at low dup
    # rates — unbounded, so never a single-task final)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("simhash", sort=False)[key_col].agg(["min", "size"]).reset_index()
        g = g.rename(columns={"min": key_col, "size": "n_copies"})
        g["_shard"] = (
            g["simhash"].to_numpy().astype(np.uint64) % np.uint64(num_shards)
        ).astype(np.int64)
        return g

    def final_shard(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("simhash", sort=False).agg(
            **{key_col: (key_col, "min"), "n_copies": ("n_copies", "sum")}
        ).reset_index()
        g["n_copies"] = g["n_copies"].astype("int64")
        return g[[key_col, "n_copies", "simhash"]]

    return exchange_group_map(
        sigs.map_batches(partial, batch_format="pandas"), final_shard, num_shards
    )


def simhash_banded_neardup(
    ds: rd.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency=(1, 4),
    num_shards: int = 64,
) -> rd.Dataset:
    """NEAR-dup SimHash: the 64-bit signature is split into 4×16-bit bands;
    docs sharing ANY band land in one LSH bucket (any signature pair within
    Hamming distance 3 shares at least one intact band — pigeonhole), then
    candidates are verified by exact Hamming distance over the full 64 bits.
    Same bucket-groupby shape as MinHash-LSH: the shuffle carries
    (band, bucket, key, sig) — 8-byte signatures, never documents.
    Returns (key_col, dup_of, hamming) for docs within ``max_hamming`` of
    their bucket representative."""

    def to_buckets(df: pd.DataFrame) -> pd.DataFrame:
        sig = df["simhash"].to_numpy().astype(np.uint64)
        n = len(sig)
        if n == 0:
            return pd.DataFrame({"shard": [], "band": [], "bucket": [],
                                 key_col: [], "simhash": []})
        bands = np.stack([(sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
                          for b in range(4)], axis=1)  # n × 4
        bucket = bands.astype(np.int64)
        return pd.DataFrame(
            {
                "shard": (bucket.reshape(-1) % num_shards).astype(np.int64),
                "band": np.tile(np.arange(4, dtype=np.int64), n),
                "bucket": bucket.reshape(-1),
                key_col: np.repeat(df[key_col].to_numpy(), 4),
                "simhash": np.repeat(sig, 4).astype(np.int64),
            }
        )

    def resolve_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key_col: [], "dup_of": [], "hamming": []})
        g = g.sort_values(["band", "bucket", key_col], kind="mergesort").reset_index(drop=True)
        sig = g["simhash"].to_numpy().astype(np.uint64)
        band = g["band"].to_numpy()
        bucket = g["bucket"].to_numpy()
        new = np.r_[True, (np.diff(band) != 0) | (np.diff(bucket) != 0)]
        rep = np.flatnonzero(new)[np.cumsum(new) - 1]
        xor = sig ^ sig[rep]
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(g), 8), axis=1).sum(axis=1)
        mask = (ham <= max_hamming) & (np.arange(len(g)) != rep)
        keys = g[key_col].to_numpy()
        return pd.DataFrame(
            {key_col: keys[mask], "dup_of": keys[rep[mask]],
             "hamming": ham[mask].astype(np.int64)}
        )

    sigs = ds.map_batches(
        _worker_cached(SimHasher, text_col, key_col),
        batch_format="pandas", batch_size=2048,
    )
    buckets = sigs.map_batches(to_buckets, batch_format="pandas")
    cand = exchange_group_map(buckets, resolve_shard, num_shards, shard_col="shard")

    # flagged per band → keep the closest (then smallest) dup_of per key,
    # via a distributed key-sharded final
    def add_kshard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ks"] = (
            _stable_hash(df[key_col].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return df

    def flag_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "hamming", "dup_of"], kind="mergesort")
        return df.groupby(key_col, sort=False).head(1)[[key_col, "dup_of", "hamming"]]

    return exchange_group_map(
        cand.map_batches(add_kshard, batch_format="pandas"),
        flag_shard, num_shards, shard_col="_ks",
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


def _shingle_hash_sets(texts: list[str], k: int, seed: int = 7):
    """Per-doc SORTED UNIQUE word-k-gram hash arrays, batch-vectorized with
    the same flat-window machinery as ``MinHasher.batch_signatures`` (one
    ``hash_array`` call for the whole batch, no string joins). Returns
    (flat uint64 array of unique shingle hashes, per-doc offsets)."""
    rng = np.random.default_rng(seed)
    kmix = (rng.integers(0, 1 << 62, size=k, dtype=np.int64).astype(np.uint64) << 1) | 1
    tok_lists = [t.lower().split() for t in texts]
    flat: list[str] = []
    lens = np.empty(len(tok_lists), dtype=np.int64)
    for i, toks in enumerate(tok_lists):
        flat.extend(toks)
        if len(toks) < k:
            flat.extend([""] * (k - len(toks)))
            lens[i] = k
        else:
            lens[i] = len(toks)
    h = pd.util.hash_array(np.array(flat, dtype=object), categorize=False)
    n_win = lens - k + 1
    doc_off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    total = int(n_win.sum())
    starts = np.repeat(doc_off, n_win) + (
        np.arange(total) - np.repeat(np.cumsum(n_win) - n_win, n_win)
    )
    shingle = np.zeros(total, dtype=np.uint64)
    for j in range(k):
        shingle += h[starts + j] * kmix[j]
    win_off = np.concatenate(([0], np.cumsum(n_win)))
    uniq: list[np.ndarray] = []
    offs = np.zeros(len(texts) + 1, dtype=np.int64)
    for i in range(len(texts)):
        u = np.unique(shingle[win_off[i] : win_off[i + 1]])
        uniq.append(u)
        offs[i + 1] = offs[i] + len(u)
    return (np.concatenate(uniq) if uniq else np.empty(0, np.uint64)), offs


def ngram_verified_dedup(
    ds: rd.Dataset,
    text_col: str = "text",
    key_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.7,
    candidate_margin: float = 0.7,
    num_shards: int = 64,
    max_broadcast_members: int = 1_000_000,
    **lsh_kw,
) -> rd.Dataset:
    """n-gram Jaccard dedup: MinHash-LSH generates candidates (with a looser
    signature threshold = threshold × candidate_margin), then each candidate
    pair is verified with the EXACT word-k-gram (hash-set) Jaccard.

    Fully distributed — nothing corpus-sized ever touches the driver:
    candidate pairs explode into (pair, member) rows; candidate TEXTS are
    narrowed to pair members and routed to their pairs by ONE
    object-exchange hash join (no sort-shuffle fixed cost); verification
    then runs per PAIR-SHARD (groupby) with batch-vectorized shingle
    hashing and sorted-array intersections — no ``.to_pandas()`` of
    pairs-with-texts, no per-pair driver loop.

    The text narrow auto-switches on candidate count: at or below
    ``max_broadcast_members`` member rows it drains the ids into an exact
    driver set (broadcast semi-join — cheapest at typical counts); above
    it NOTHING candidate-proportional touches the driver — a Bloom filter
    over the member ids is built distributively (OR-fold of fixed-size bit
    arrays, ``sketch.build_bloom``) and broadcast instead. Bloom false
    positives only add stragglers to the hash join's probe side; the join
    is inner on exact ids, so the result is identical to the exact path.
    Returns (key_col, dup_of, jaccard) for verified duplicates."""
    from ..stages.joins import (_cached_get, object_exchange_hash_join,
                                semi_join_filter)

    cand = minhash_lsh_dedup(
        ds, text_col=text_col, key_col=key_col, k=k,
        threshold=threshold * candidate_margin, num_shards=num_shards, **lsh_kw,
    )

    # pair rows: flag output has ONE row per flagged key, so the flagged key
    # itself is the pair id; explode to (pair, member, side)
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        keys = df[key_col].to_numpy()
        dups = df["dup_of"].to_numpy()
        return pd.DataFrame(
            {
                "pair": np.repeat(keys, 2),
                "member": np.ravel(np.column_stack([keys, dups])),
                "side": np.tile(np.array([0, 1], dtype=np.int64), n),
            }
        )

    # materialize the pair rows (ids only, ≈24 B/candidate — object-store
    # resident, never driver-resident): they are consumed TWICE below (the
    # id-set drain and the join), and without a materialize the whole
    # LSH candidate pipeline re-executes for each consumer (~2 s at sf0.1)
    pair_rows = cand.map_batches(explode, batch_format="pandas").materialize()
    n_members = pair_rows.count()  # 2 rows per candidate pair
    if n_members == 0:
        try:
            ktype = ds.schema().base_schema.field(key_col).type
        except Exception:
            ktype = pa.int64()
        empty = pa.table({key_col: pa.array([], ktype),
                          "dup_of": pa.array([], ktype),
                          "jaccard": pa.array([], pa.float64())})
        return rd.from_arrow(empty)
    texts = ds.map_batches(lambda t: t.select([key_col, text_col]),
                           batch_format="pyarrow")
    if n_members <= max_broadcast_members:
        # small path: exact ids-only driver set (≈16 B/candidate)
        member_ids = set()
        for b in pair_rows.select_columns(["member"]).iter_batches(
                batch_format="pyarrow"):
            member_ids.update(b["member"].to_pylist())
        texts_cand = semi_join_filter(texts, member_ids, on=key_col)
    else:
        # large path: distributed Bloom narrow — the driver holds one
        # fixed-size bit array, never a candidate-proportional set. Sized
        # ~16 bits/member (<1% FP), capped at 1 GiB; overflow past the cap
        # only raises the FP rate (extra probe-side rows into the exact
        # inner join), never correctness.
        from .sketch import bloom_contains, build_bloom

        n_bits = 1 << min(33, max(20, int(np.ceil(np.log2(16 * n_members)))))
        bloom_ref = ray.put(build_bloom(pair_rows, "member", n_bits=n_bits))

        def bloom_narrow(t: pa.Table) -> pa.Table:
            mask = bloom_contains(
                _cached_get(bloom_ref),
                t[key_col].to_numpy(zero_copy_only=False))
            return t.filter(pa.array(mask))

        texts_cand = texts.map_batches(bloom_narrow, batch_format="pyarrow")
    texts_cand = texts_cand.map_batches(
        lambda df: df.rename(columns={key_col: "member", text_col: "_text"}),
        batch_format="pandas",
    )
    joined = object_exchange_hash_join(pair_rows, texts_cand, on="member",
                                       num_buckets=num_shards)

    def add_pshard(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ps"] = (
            _stable_hash(df["pair"].to_numpy()) % np.uint64(num_shards)
        ).astype(np.int64)
        return df

    def verify_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["pair", "side"], kind="mergesort").reset_index(drop=True)
        pairs = g["pair"].to_numpy()
        new = np.r_[True, pairs[1:] != pairs[:-1]]
        starts = np.flatnonzero(new)
        flat, offs = _shingle_hash_sets(g["_text"].astype(str).tolist(), k)
        out_k, out_d, out_j = [], [], []
        members = g["member"].to_numpy()
        sides = g["side"].to_numpy()
        for s in starts:
            # each complete pair contributes exactly rows s (side 0) and s+1
            if s + 1 >= len(g) or pairs[s + 1] != pairs[s]:
                continue  # partner row missing (shouldn't happen)
            a = flat[offs[s] : offs[s + 1]]
            b = flat[offs[s + 1] : offs[s + 2]]
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jac = inter / max(len(a) + len(b) - inter, 1)
            if jac >= threshold:
                i0, i1 = (s, s + 1) if sides[s] == 0 else (s + 1, s)
                out_k.append(members[i0])
                out_d.append(members[i1])
                out_j.append(jac)
        return pd.DataFrame({key_col: out_k, "dup_of": out_d,
                             "jaccard": np.asarray(out_j, dtype=np.float64)})

    return exchange_group_map(
        joined.map_batches(add_pshard, batch_format="pandas"),
        verify_shard, num_shards, shard_col="_ps",
    )


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

    return exchange_coalesce_map(pairs, uf)


def cluster_duplicates_distributed(
    pairs: rd.Dataset, key_col: str = "doc_id", dup_col: str = "dup_of",
    num_buckets: int = 32, max_rounds: int = 25,
) -> rd.Dataset:
    """Connected components for pair sets too large for one task: rounds of
    MIN-LABEL PROPAGATION (label(v) <- min over v's neighbors' labels) plus
    POINTER JUMPING (label(v) <- label(label(v)), path halving -> O(log
    diameter) rounds). Implemented as an EXPLICIT hash-sharded task shuffle
    over raw Ray tasks - the documented last-resort tier for iterative
    shared-state algorithms: this Ray version's streaming executor
    reproducibly deadlocks when an iterated plan chains two groupby
    shuffles across a union, and per-round Dataset fixed costs (seconds
    per sort shuffle) would dominate anyway. Each round:

      answer stage: one task per shard s holding the label rows whose
        hash(node)=s ("have") - answers label lookups for edge endpoints
        (hash(nbr)=s, routed once up front) and pointer-jump requests
        (hash(label)=s, re-routed each round); emits (node, label)
        candidates routed by hash(node).
      min stage: one task per shard - elementwise min of its label rows
        and incoming candidates; returns the new shard + Sigma-label
        (monotone convergence witness).

    All exchange goes through the object store as per-shard Arrow tables -
    the same volume a Dataset shuffle would move, without its control
    plane. THE DRIVER ONLY EVER HOLDS ObjectRefs AND PER-ROUND SCALAR
    CHECKSUMS: edge blocks are routed to shards by remote tasks
    (``num_returns``-fanout), initial labels are derived shard-locally
    from the routed node ids, candidate/jump tables flow task→task as
    refs, and the result is returned via ``from_arrow_refs`` — nothing
    proportional to the pair set or the node set ever lands on the
    driver (a 10^9-pair crawl graph stays distributed end to end).
    Labels only decrease; fixpoint when Sigma-label stops changing. Same
    output contract as ``cluster_duplicates`` (min-key cluster reps),
    numeric keys required."""
    from ..cdc.collapse import hash_partition

    # B >= 2: every fan-out below relies on ray's num_returns=B returning a
    # LIST of refs, but num_returns=1 returns a bare ref (and a 1-tuple
    # would be stored as one object) — a single-bucket run is just the
    # 2-shard exchange with one mostly-empty shard, so clamp instead
    B = max(num_buckets, 2)

    def to_edges(t: pa.Table) -> pa.Table:
        a, b = t[key_col].combine_chunks(), t[dup_col].combine_chunks()
        return pa.table({"node": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                         "nbr": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())])})

    def _split(tab: pa.Table, col: str) -> list[pa.Table]:
        sh = hash_partition(tab[col], B)
        order = np.argsort(sh, kind="stable")
        tab = tab.take(pa.array(order))
        bounds = np.searchsorted(sh[order], np.arange(B + 1))
        return [tab.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i]))
                for i in range(B)]

    _EMPTY_EDGE = pa.table({"node": pa.array([], pa.int64()),
                            "nbr": pa.array([], pa.int64())})
    _EMPTY_LABEL = pa.table({"node": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())})
    _EMPTY_JUMP = pa.table({"ask": pa.array([], pa.int64()),
                            "node": pa.array([], pa.int64())})

    @ray.remote
    def route_block(tab: pa.Table):
        """One edge block → B edge partitions by hash(nbr) (the ask key
        for neighbor lookups) + B block-local-unique node tables by
        hash(node) (feedstock for shard-local initial labels)."""
        edges = _split(tab.select(["node", "nbr"]), "nbr")
        nodes = [pa.table({"node": pc.unique(p["node"])})
                 for p in _split(tab.select(["node"]), "node")]
        return tuple(edges + nodes)

    @ray.remote
    def concat_edges(*parts: pa.Table) -> pa.Table:
        ps = [p for p in parts if p.num_rows]
        return pa.concat_tables(ps) if ps else _EMPTY_EDGE

    @ray.remote
    def init_shard(*node_parts: pa.Table):
        """label(v) = v over this shard's (deduped) nodes + the round-0
        jump view (ask = label = node, so every row stays in-shard)."""
        ps = [p for p in node_parts if p.num_rows]
        if not ps:
            return _EMPTY_LABEL, _EMPTY_JUMP
        nodes = pc.unique(pa.concat_tables(ps)["node"].combine_chunks())
        return (pa.table({"node": nodes, "label": nodes}),
                pa.table({"ask": nodes, "node": nodes}))

    block_refs = pairs.map_batches(
        to_edges, batch_format="pyarrow").to_arrow_refs()
    routed = [route_block.options(num_returns=2 * B).remote(r)
              for r in block_refs]
    n_blocks = len(routed)
    edge_refs = [concat_edges.remote(*[routed[i][s] for i in range(n_blocks)])
                 for s in range(B)]
    init = [init_shard.options(num_returns=2).remote(
        *[routed[i][B + s] for i in range(n_blocks)]) for s in range(B)]
    label_refs = [r[0] for r in init]
    empty_jump_ref = ray.put(_EMPTY_JUMP)
    # jump_out[src][dst]: round-0 jumps never leave their own shard
    jump_out = [[init[src][1] if dst == src else empty_jump_ref
                 for dst in range(B)] for src in range(B)]

    @ray.remote
    def answer(label_tab: pa.Table, edge_tab: pa.Table, *jump_reqs: pa.Table):
        have = label_tab.to_pandas()
        asks = [edge_tab.to_pandas().rename(columns={"nbr": "ask"})]
        for jr in jump_reqs:
            if jr.num_rows:
                asks.append(jr.to_pandas())
        req = pd.concat(asks, ignore_index=True)
        out = req.merge(have.rename(columns={"node": "ask"}), on="ask")[["node", "label"]]
        cand = pa.table({"node": pa.array(out["node"].to_numpy(), pa.int64()),
                         "label": pa.array(out["label"].to_numpy(), pa.int64())})
        return tuple(_split(cand, "node"))

    @ray.remote
    def min_shard(label_tab: pa.Table, *cands: pa.Table):
        frames = [label_tab.to_pandas()] + [c.to_pandas() for c in cands if c.num_rows]
        df = pd.concat(frames, ignore_index=True)
        out = df.groupby("node", sort=False, as_index=False)["label"].min()
        new = pa.table({"node": pa.array(out["node"].to_numpy(), pa.int64()),
                        "label": pa.array(out["label"].to_numpy(), pa.int64())})
        # jump requests for NEXT round: (ask=label(v), node=v), pre-routed
        jt = pa.table({"ask": new["label"], "node": new["node"]})
        return tuple([new, int(out["label"].sum())] + _split(jt, "ask"))

    prev_sum = None
    for _ in range(max_rounds):
        # candidates flow answer→min_shard as refs (varargs resolve them
        # in the receiving task); the driver touches only the B sums
        cand = [answer.options(num_returns=B).remote(
                    label_refs[s], edge_refs[s],
                    *[jump_out[src][s] for src in range(B)])
                for s in range(B)]
        results = [min_shard.options(num_returns=B + 2).remote(
                       label_refs[s], *[cand[src][s] for src in range(B)])
                   for s in range(B)]
        label_refs = [r[0] for r in results]
        cur_sum = sum(ray.get([r[1] for r in results]))
        jump_out = [list(r[2:]) for r in results]
        if cur_sum == prev_sum:  # labels are non-increasing -> fixpoint
            break
        prev_sum = cur_sum

    @ray.remote
    def finish(tab: pa.Table) -> pa.Table:
        return tab.rename_columns([key_col, "cluster"])

    return rd.from_arrow_refs([finish.remote(r) for r in label_refs])


# --- embedding cosine near-dup ----------------------------------------------

class PlaneBucketer:
    """Actor-pool bucketize stage for ``embedding_neardup``: hyperplanes are
    generated ONCE per actor (``__init__``-style lazy cache keyed by dim —
    the fixed seed keeps every actor's planes identical), vectors are
    unit-normalized, bucket = sign pattern of the projections."""

    def __init__(self, emb_col: str, key_col: str, n_planes: int, seed: int,
                 num_shards: int):
        self.emb_col, self.key_col = emb_col, key_col
        self.n_planes, self.seed, self.num_shards = n_planes, seed, num_shards
        self._planes: np.ndarray | None = None  # dim known at first batch

    def _planes_for(self, dim: int) -> np.ndarray:
        if self._planes is None or self._planes.shape[0] != dim:
            self._planes = np.random.default_rng(self.seed).standard_normal(
                (dim, self.n_planes)
            )
        return self._planes

    def __call__(self, t: pa.Table) -> pa.Table:
        from .ann import _to_matrix, _unit

        emb = _to_matrix(t[self.emb_col])
        unit = _unit(emb)
        planes = self._planes_for(emb.shape[1])
        signs = (unit @ planes) > 0
        bucket = (signs * (1 << np.arange(self.n_planes))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                self.key_col: t[self.key_col],
                "shard": pa.array(bucket % self.num_shards),
                "bucket": pa.array(bucket),
                "unit": pa.array(list(unit), type=pa.list_(pa.float64())),
            }
        )


def embedding_neardup(
    ds: rd.Dataset,
    emb_col: str = "embedding",
    key_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 11,
    num_shards: int = 64,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Cosine near-dup via random-hyperplane LSH buckets + exact in-bucket
    cosine. Deterministic planes from a fixed seed (cached per actor);
    bucket = sign pattern — near-identical vectors share all signs w.h.p.;
    at scale, multi-probe or repeated plane sets raise recall (documented
    tradeoff). Resolution runs per bucket-hash SHARD (one vectorized call
    per shard, not one per bucket): within each bucket, each vector is
    flagged against its best EARLIER-keyed bucket member via an argmax over
    the masked lower triangle of the unit-dot matrix — no per-row Python
    loop. A pathological hot bucket (e.g. near-zero vectors all hashing
    alike) is O(bucket²) — raise ``n_planes`` or pre-filter norms if the
    corpus has one. Returns (key_col, dup_of, cos)."""

    def resolve_shard(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({key_col: np.array([], dtype=object),
                                 "dup_of": np.array([], dtype=object),
                                 "cos": np.array([], dtype=np.float64)})
        g = g.sort_values(["bucket", key_col], kind="mergesort").reset_index(drop=True)
        u = np.stack(g["unit"].to_numpy())
        keys = g[key_col].to_numpy()
        buckets = g["bucket"].to_numpy()
        bounds = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1], True])
        out_k, out_d, out_c = [], [], []
        for bi in range(len(bounds) - 1):
            lo, hi = int(bounds[bi]), int(bounds[bi + 1])
            n = hi - lo
            if n < 2:
                continue
            sub = u[lo:hi]
            sims = sub @ sub.T
            # best earlier-keyed member per row: argmax over the strict
            # lower triangle (row 0 has none → stays -inf)
            masked = np.where(np.tri(n, k=-1, dtype=bool), sims, -np.inf)
            j = np.argmax(masked, axis=1)
            best = masked[np.arange(n), j]
            hit = best >= threshold
            if hit.any():
                idx = np.flatnonzero(hit)
                out_k.append(keys[lo + idx])
                out_d.append(keys[lo + j[idx]])
                out_c.append(best[idx])
        if not out_k:
            return pd.DataFrame({key_col: np.array([], dtype=object),
                                 "dup_of": np.array([], dtype=object),
                                 "cos": np.array([], dtype=np.float64)})
        return pd.DataFrame(
            {
                key_col: np.concatenate(out_k),
                "dup_of": np.concatenate(out_d),
                "cos": np.concatenate(out_c).astype(np.float64),
            }
        )

    # light state (planes, KBs) → worker-cached task, not actor pool
    buckets = ds.map_batches(
        _worker_cached(PlaneBucketer, emb_col, key_col, n_planes, seed, num_shards),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True,
    )
    return exchange_group_map(buckets, resolve_shard, num_shards, shard_col="shard")
