"""Model-based quality scoring: a character-class trigram language model
trained on a bounded corpus sample, scoring perplexity distributed.

The standard data-curation shape (e.g. the CCNet/KenLM-style "score
every document with a small LM trained on clean text, filter on
perplexity" recipe, done from scratch): texts map byte-for-byte onto a
small character-class alphabet (lowercase letters collapse case, digits
are one class, whitespace one, other punctuation a few), a trigram count
tensor ``(V, V, V)`` is built over the sample with add-k smoothing, and
scoring is one vectorized gather per document batch — no per-character
Python in the hot path.

Scale shape mirrors ``functions/bpe.py``: TRAINING reads a bounded
deterministic sample (``limit(sample_n)``, per-batch count partials
summed on the driver — each partial is the fixed-size count tensor, so
the fold is O(V^3) regardless of corpus size); SCORING is the
distributed hot path (the model tensor ships once per worker via
``_worker_cached``, each batch concatenates its texts into one byte
array, class-maps it with one table lookup and gathers log-probs with
one fancy-index). V=32 keeps the tensor at 32^3 floats = 128 KB.

Output is a float perplexity per doc — genuinely non-SQL-expressible,
so the op is pytest-verified (clean text must score materially lower
perplexity than shuffled/gibberish text; deterministic across runs)
rather than driver-hashed, like the other estimate-valued ops.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

import ray.data as rd

from .text import _worker_cached

V = 32  # character classes
_BOS = 0  # class 0 doubles as padding/start-of-text


def _class_table() -> np.ndarray:
    """256 → class id: 1-26 letters (case-folded), 27 digit, 28 space,
    29 sentence punctuation, 30 other ASCII, 31 non-ASCII byte."""
    t = np.full(256, 30, dtype=np.uint8)
    for i in range(ord("a"), ord("z") + 1):
        t[i] = i - ord("a") + 1
    for i in range(ord("A"), ord("Z") + 1):
        t[i] = i - ord("A") + 1
    for i in range(ord("0"), ord("9") + 1):
        t[i] = 27
    for c in b" \t\n\r":
        t[c] = 28
    for c in b".,;:!?'\"":
        t[c] = 29
    t[128:] = 31
    return t


_CLASSES = _class_table()


def _doc_codes(text: str) -> np.ndarray:
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    return _CLASSES[b]


def _count_batch(t: pa.Table, text_col: str) -> pa.Table:
    """One fixed-size trigram-count partial per batch (flattened)."""
    counts = np.zeros((V, V, V), dtype=np.int64)
    for s in t[text_col].to_pylist():
        c = _doc_codes(s or "")
        if len(c) == 0:
            continue
        c2 = np.concatenate(([_BOS, _BOS], c))  # BOS padding
        np.add.at(counts, (c2[:-2], c2[1:-1], c2[2:]), 1)
    return pa.table({"counts": pa.array([counts.reshape(-1)],
                                        pa.list_(pa.int64()))})


def train_char_lm(source, text_col: str = "text", sample_n: int = 512,
                  add_k: float = 0.1) -> np.ndarray:
    """→ (V, V, V) float32 log-prob tensor. Dataset input trains on a
    bounded deterministic ``limit(sample_n)`` prefix with distributed
    count partials; a list of strings trains locally."""
    counts = np.zeros((V, V, V), dtype=np.int64)
    if isinstance(source, rd.Dataset):
        parts = source.limit(sample_n).map_batches(
            functools.partial(_count_batch, text_col=text_col),
            batch_format="pyarrow").take_all()  # fixed-size partials
        for row in parts:
            counts += np.asarray(row["counts"], dtype=np.int64).reshape(V, V, V)
    else:
        for s in source:
            c = _doc_codes(s or "")
            if len(c) == 0:
                continue
            c2 = np.concatenate(([_BOS, _BOS], c))
            np.add.at(counts, (c2[:-2], c2[1:-1], c2[2:]), 1)
    smoothed = counts.astype(np.float64) + add_k
    logp = np.log(smoothed / smoothed.sum(axis=2, keepdims=True))
    return logp.astype(np.float32)


def _batch_ppl(logp: np.ndarray, texts: list) -> tuple[np.ndarray, np.ndarray]:
    """One batch's perplexities: one batch-wide gather — concatenate
    [BOS,BOS]+codes per doc so each doc's trigram windows stay inside its
    own padded segment, mask the two BOS-position rows out and reduce per
    segment. Returns (ppl, n_chars); empty docs score NaN."""
    codes = [_doc_codes(s or "") for s in texts]
    lens = np.array([len(c) for c in codes], dtype=np.int64)
    padded = [np.concatenate(([_BOS, _BOS], c)) for c in codes]
    if padded:
        flat = np.concatenate(padded)
        lp = np.zeros(len(flat), dtype=np.float64)
        lp[2:] = logp[flat[:-2], flat[1:-1], flat[2:]]
        seg = np.concatenate(([0], np.cumsum(lens + 2)))[:-1]
        # zero the first two positions of every segment (BOS pads and,
        # equivalently, the stale windows crossing doc boundaries)
        lp[seg] = 0.0
        lp[seg + 1] = 0.0
        sums = np.add.reduceat(lp, seg)
    else:
        sums = np.zeros(0, dtype=np.float64)
    ppl = np.where(lens > 0, np.exp(-sums / np.maximum(lens, 1)), np.nan)
    return ppl, lens


class PerplexityScorer:
    """Distributed scoring stage (worker-cached): text → trigram
    perplexity. One vectorized log-prob gather per document."""

    def __init__(self, logp_bytes: bytes, text_col: str = "text",
                 key_col: str = "doc_id"):
        self.logp = np.frombuffer(logp_bytes, dtype=np.float32).reshape(V, V, V)
        self.text_col, self.key_col = text_col, key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ppl, lens = _batch_ppl(self.logp, t[self.text_col].to_pylist())
        return pa.table({
            self.key_col: t[self.key_col],
            "ppl": pa.array(ppl, pa.float64()),
            "n_chars": pa.array(lens, pa.int64()),
        })


def perplexity_score(ds: rd.Dataset, logp: np.ndarray,
                     text_col: str = "text", key_col: str = "doc_id",
                     batch_size: int = 1024) -> rd.Dataset:
    return ds.map_batches(
        _worker_cached(PerplexityScorer,
                       logp.astype(np.float32).tobytes(), text_col, key_col),
        batch_format="pyarrow", batch_size=batch_size)


class PerplexityFilter:
    """Worker-cached filter stage: keep rows whose trigram perplexity is
    at or below ``cutoff``, ALL input columns intact. The scale-correct
    twin of ``PerplexityScorer`` for a known cutoff: the score is a cheap
    stateless per-row function, so the filter recomputes it inline instead
    of materializing a corpus-sized key set on the driver and broadcasting
    it back (the pattern `pipelines/curate.py` streams through). Empty
    docs score NaN and are dropped — identical to ``ppl <= cutoff`` over
    the scorer's output (NaN fails the comparison)."""

    def __init__(self, logp_bytes: bytes, cutoff: float,
                 text_col: str = "text"):
        self.logp = np.frombuffer(logp_bytes, dtype=np.float32).reshape(V, V, V)
        self.cutoff, self.text_col = float(cutoff), text_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ppl, _ = _batch_ppl(self.logp, t[self.text_col].to_pylist())
        keep = np.nan_to_num(ppl, nan=np.inf) <= self.cutoff
        return t.filter(pa.array(keep))


def perplexity_filter(ds: rd.Dataset, logp: np.ndarray, cutoff: float,
                      text_col: str = "text",
                      batch_size: int = 1024) -> rd.Dataset:
    """Streaming quality gate: drop rows scoring above ``cutoff``."""
    return ds.map_batches(
        _worker_cached(PerplexityFilter,
                       logp.astype(np.float32).tobytes(), float(cutoff),
                       text_col),
        batch_format="pyarrow", batch_size=batch_size)
