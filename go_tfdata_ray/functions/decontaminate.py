"""Benchmark decontamination: flag or drop training documents that share
word n-grams with an evaluation/benchmark set — the published recipe
(GPT-3 appendix C / PaLM-style 13-gram overlap) as a Ray-Data-first pair
of stages.

Shape at 100 TB: the EVAL side is small by construction (benchmarks are
KB..GB), so it compresses into ONE broadcast filter — an exact sorted
uint64 hash array under ``max_exact`` distinct n-grams, a Bloom filter
above it (`sketch.build_bloom`, OR-fold of fixed-size bit arrays — the
build never drains n-grams to the driver; only the final bit array does).
The TRAIN side then streams: one `map_batches` pass, per-batch vectorized
rolling n-gram hashing (flat word-hash array + sliding windows, windows
crossing doc boundaries masked out), membership via `searchsorted` /
`bloom_contains` — no shuffle, no join, nothing train-proportional on the
driver. Bloom false positives only ever OVER-flag (drop a clean doc),
never leak a contaminated one — the safe direction for decontamination.

Reference parity: NVIDIA/go-tfdata has no decontamination surface — this
is a beyond-parity component of the training-data operator library,
composing the same primitives as `functions/dedup.py` (hash-only
broadcast, `_cached_get` worker caching).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.joins import _cached_get
from .sketch import bloom_contains, build_bloom

__all__ = ["build_eval_filter", "flag_contamination", "decontaminate"]

_WORD_RX = re.compile(r"[a-z0-9]+")
# odd multiplier for the positional (order-sensitive) n-gram combine
_M = np.uint64(0x9E3779B97F4A7C15)


def rolling_window_hashes(
    h: np.ndarray, counts: np.ndarray, n: int, mult: np.uint64 = _M
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared rolling-hash core (also used by span-level dedup,
    `functions/spandedup.py`): element hashes ``h`` (uint64) laid out as
    ``counts[i]`` consecutive entries per row i → (window_hash: uint64,
    row_of_window: int64, pos_in_row: int64) for every length-``n``
    window that lies fully inside one row. Positional combine
    ``sum_j h[i+j] * mult**j`` under natural uint64 wraparound; a second
    ``mult`` gives an independent hash family (spandedup pairs two into
    an effective 128-bit window fingerprint)."""
    if len(h) < n:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                np.empty(0, np.int64))
    row_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    win = np.lib.stride_tricks.sliding_window_view(h, n)
    pw = np.multiply.accumulate(
        np.concatenate([np.ones(1, np.uint64), np.full(n - 1, mult, np.uint64)])
    )
    gh = (win * pw).sum(axis=1, dtype=np.uint64)
    gdoc = row_of[: len(gh)]
    valid = row_of[n - 1 :] == gdoc
    starts = np.concatenate([np.zeros(1, np.int64), np.cumsum(counts)[:-1]])
    pos = np.arange(len(gh), dtype=np.int64) - starts[gdoc]
    return gh[valid], gdoc[valid], pos[valid]


def _doc_ngram_hashes(
    texts: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Flat (gram_hash: uint64, doc_row: int64) for every word n-gram in
    the batch, plus the batch's row count. One regex pass per doc
    (inherent string work), then fully vectorized: per-word siphash
    (`pd.util.hash_array`, fixed key — process-stable), sliding windows
    over the FLAT word-hash array, positional combine
    ``sum_j h[i+j] * M**j`` under natural uint64 wraparound, and windows
    that cross a document boundary masked out."""
    words: list[str] = []
    counts = np.empty(len(texts), np.int64)
    for i, txt in enumerate(texts):
        w = _WORD_RX.findall(str(txt).lower())
        counts[i] = len(w)
        words.extend(w)
    empty = (np.empty(0, np.uint64), np.empty(0, np.int64), len(texts))
    if len(words) < n:
        return empty
    wh = pd.util.hash_array(
        np.array(words, dtype=object), categorize=False
    ).astype(np.uint64)
    gh, gdoc, _pos = rolling_window_hashes(wh, counts, n)
    return gh, gdoc, len(texts)


def _distinct_per_doc(
    gh: np.ndarray, gdoc: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Dedupe (doc, gram) pairs — hit counts are per DISTINCT gram, the
    SQL-reproducible ``count(DISTINCT gram)`` semantics."""
    if len(gh) == 0:
        return gh, gdoc
    order = np.lexsort((gh, gdoc))
    gd, gg = gdoc[order], gh[order]
    keep = np.ones(len(gg), bool)
    keep[1:] = (gd[1:] != gd[:-1]) | (gg[1:] != gg[:-1])
    return gg[keep], gd[keep]


def _member_mask(filt: dict[str, Any], gh: np.ndarray) -> np.ndarray:
    if len(gh) == 0:
        return np.zeros(0, dtype=bool)
    if filt["mode"] == "exact":
        H = filt["hashes"]
        if len(H) == 0:
            return np.zeros(len(gh), dtype=bool)
        idx = np.searchsorted(H, gh)
        return (idx < len(H)) & (H[np.minimum(idx, len(H) - 1)] == gh)
    return bloom_contains(filt["bits"], gh)


def build_eval_filter(
    eval_ds: rd.Dataset,
    text_col: str = "text",
    n: int = 13,
    max_exact: int = 2_000_000,
) -> dict[str, Any]:
    """One-pass distributed build of the eval-set n-gram filter.

    Per-batch: hash the batch's n-grams and emit the batch-distinct
    hashes (8 B each — nothing text-sized leaves the read tasks). At or
    under ``max_exact`` hash rows the driver folds them into one sorted
    uint64 array (exact membership; ≤16 MB at the default cap); above it
    a Bloom filter is OR-folded distributively (~16 bits/gram, <1% FP,
    capped at 1 GiB — overflow past the cap only raises the FP rate,
    i.e. extra clean docs flagged, never a missed contamination)."""

    def grams(t: pa.Table) -> pa.Table:
        gh, _, _ = _doc_ngram_hashes(
            t[text_col].to_numpy(zero_copy_only=False), n
        )
        return pa.table({"h": pa.array(np.unique(gh))})

    hs = eval_ds.map_batches(grams, batch_format="pyarrow").materialize()
    total = hs.count()  # upper bound (cross-batch dups still counted)
    if total <= max_exact:
        parts = [
            b["h"].to_numpy(zero_copy_only=False)
            for b in hs.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        H = (
            np.unique(np.concatenate(parts)).astype(np.uint64)
            if parts
            else np.empty(0, np.uint64)
        )
        return {"mode": "exact", "n": n, "hashes": H}
    n_bits = 1 << min(33, max(20, int(np.ceil(np.log2(16 * total)))))
    return {"mode": "bloom", "n": n, "bits": build_bloom(hs, "h", n_bits=n_bits)}


def flag_contamination(
    train_ds: rd.Dataset,
    filt: dict[str, Any],
    text_col: str = "text",
    key_col: str = "doc_id",
    min_hits: int = 1,
) -> rd.Dataset:
    """Per-doc contamination report: (key, n_grams, n_hits, contaminated)
    where ``n_grams``/``n_hits`` count DISTINCT n-grams (total / present
    in the eval filter) and ``contaminated = n_hits >= min_hits``. One
    streaming pass; the filter ships once via ``ray.put`` and is cached
    per worker process."""
    ref = ray.put(filt)

    def flag(t: pa.Table) -> pa.Table:
        f = _cached_get(ref)
        gh, gdoc, n_rows = _doc_ngram_hashes(
            t[text_col].to_numpy(zero_copy_only=False), f["n"]
        )
        gh, gdoc = _distinct_per_doc(gh, gdoc)
        hit = _member_mask(f, gh)
        n_grams = np.bincount(gdoc, minlength=n_rows)
        n_hits = np.bincount(gdoc[hit], minlength=n_rows)
        return pa.table({
            key_col: t[key_col],
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "n_hits": pa.array(n_hits.astype(np.int64)),
            "contaminated": pa.array(n_hits >= min_hits),
        })

    return train_ds.map_batches(flag, batch_format="pyarrow",
                                zero_copy_batch=True)


def decontaminate(
    train_ds: rd.Dataset,
    filt: dict[str, Any],
    text_col: str = "text",
    min_hits: int = 1,
) -> rd.Dataset:
    """Drop contaminated docs in one pass, keeping every input column —
    the curation-pipeline stage form. Under a Bloom filter, false
    positives can drop a clean doc (documented tradeoff); contaminated
    docs are never kept."""
    ref = ray.put(filt)

    def keep(t: pa.Table) -> pa.Table:
        f = _cached_get(ref)
        gh, gdoc, n_rows = _doc_ngram_hashes(
            t[text_col].to_numpy(zero_copy_only=False), f["n"]
        )
        gh, gdoc = _distinct_per_doc(gh, gdoc)
        hit = _member_mask(f, gh)
        n_hits = np.bincount(gdoc[hit], minlength=n_rows)
        return t.filter(pa.array(n_hits < min_hits))

    return train_ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True)
