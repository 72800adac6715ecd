"""From-scratch byte-level BPE: train merges on a bounded corpus sample,
apply distributed with worker-cached state.

The classic byte-pair-encoding algorithm (Sennrich et al. 2016; the
byte-level base-vocab variant popularized by GPT-2's public tokenizer):
pretokenize with the same regex the rest of the text stack uses
(``[A-Za-z]+|\\d+|[^\\sA-Za-z\\d]+``), map each pretoken to its UTF-8
byte sequence (base vocab = 256 ids), then greedily merge the most
frequent adjacent pair ``n_merges`` times, each merge minting one new id
whose bytes are the concatenation of its parts. Encoding is therefore
LOSSLESS by construction: ``decode(encode(text)) ==
"".join(pretokens(text))`` exactly — the property the driver row
hash-checks end-to-end.

Scale shape: training reads a BOUNDED deterministic sample
(``sample_n`` docs — the industry shape: tokenizers are trained on a
sample, applied to the full corpus), with the word-frequency count done
distributed (per-batch ``Counter`` partials over ``map_batches``, folded
over at most ``sample_n`` docs' unique words on the driver). The greedy
merge loop itself is driver-side over the sample's unique-word dict —
O(n_merges × unique words), independent of corpus size. APPLICATION is
the distributed hot path: the merge-rank table ships once per worker
(``_worker_cached``), each batch encodes its UNIQUE pretokens once
through a size-capped (generationally cleared) cache — the pretoken
space includes ``\\d+`` runs so it is unbounded and a plain dict would
grow for the worker-process lifetime — and ids come out as Arrow
``list<int32>``.

Merge selection tiebreaks deterministically (highest count, then
lexicographically smallest pair), so the same sample always yields the
same tokenizer — required for the driver's hash-stable rows.
"""

from __future__ import annotations

import functools
import re
from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from .text import _worker_cached

_PRETOKEN_RX = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_CACHE_CAP = 262_144  # unique-pretoken cache entries before a clear


class BPE:
    """Trained tokenizer state: ``merges`` (ordered (id, id) pairs) and
    ``vocab`` (id → bytes; 0-255 single bytes, 256+k the k-th merge)."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = merges
        self.vocab: list[bytes] = [bytes([i]) for i in range(256)]
        for a, b in merges:
            self.vocab.append(self.vocab[a] + self.vocab[b])
        self.ranks = {pair: r for r, pair in enumerate(merges)}

    def encode_word(self, word: tuple[int, ...]) -> tuple[int, ...]:
        """Apply merges to one pretoken's byte ids, lowest rank first."""
        ranks = self.ranks
        ids = list(word)
        while len(ids) > 1:
            best_r, best_i = None, -1
            for i in range(len(ids) - 1):
                r = ranks.get((ids[i], ids[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_r, best_i = r, i
            if best_r is None:
                break
            ids[best_i:best_i + 2] = [256 + best_r]
        return tuple(ids)

    def encode(self, text: str, _cache=None) -> list[int]:
        cache = _cache if _cache is not None else {}
        out: list[int] = []
        for w in _PRETOKEN_RX.findall(text):
            ids = cache.get(w)
            if ids is None:
                if len(cache) >= _CACHE_CAP:  # generational clear: the
                    cache.clear()  # pretoken space (\d+ runs, ids) is
                ids = self.encode_word(tuple(w.encode("utf-8")))  # unbounded
                cache[w] = ids
            out.extend(ids)
        return out

    def decode(self, ids) -> str:
        return b"".join(self.vocab[int(i)] for i in ids).decode("utf-8")


def _merge_word(word: tuple[int, ...], pair: tuple[int, int],
                new_id: int) -> tuple[int, ...]:
    out, i, n = [], 0, len(word)
    while i < n:
        if i < n - 1 and word[i] == pair[0] and word[i + 1] == pair[1]:
            out.append(new_id)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def _word_freqs_batch(t: pa.Table, text_col: str) -> pa.Table:
    c: Counter = Counter()
    for s in t[text_col].to_pylist():
        c.update(_PRETOKEN_RX.findall(s or ""))
    words, freqs = (list(c.keys()), list(c.values())) if c else ([], [])
    return pa.table({"word": pa.array(words, pa.string()),
                     "freq": pa.array(freqs, pa.int64())})


def train_bpe(source, text_col: str = "text", n_merges: int = 256,
              sample_n: int = 512) -> BPE:
    """Train on a Dataset (bounded deterministic ``limit(sample_n)``
    prefix, word counts distributed per batch) or a list of strings."""
    if isinstance(source, rd.Dataset):
        sample = source.limit(sample_n)
        parts = sample.map_batches(
            functools.partial(_word_freqs_batch, text_col=text_col),
            batch_format="pyarrow").take_all()  # ≤ sample_n docs' words
        freq: Counter = Counter()
        for row in parts:
            freq[row["word"]] += row["freq"]
    else:
        freq = Counter()
        for s in source:
            freq.update(_PRETOKEN_RX.findall(s or ""))
    words: dict[tuple[int, ...], int] = {}
    for w, f in freq.items():
        key = tuple(w.encode("utf-8"))
        words[key] = words.get(key, 0) + f
    merges: list[tuple[int, int]] = []
    for k in range(n_merges):
        pairs: Counter = Counter()
        for word, f in words.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        new_id = 256 + k
        words = {_merge_word(w, best, new_id): f for w, f in words.items()}
        merges.append(best)
    return BPE(merges)


class BPEApplier:
    """Distributed apply stage (worker-cached): text → list<int32> ids.
    The merge table builds once per worker process from the shipped
    merges list; each batch encodes its unique pretokens once."""

    def __init__(self, merges: list[tuple[int, int]],
                 text_col: str = "text", key_col: str = "doc_id"):
        self.bpe = BPE(list(merges))
        self.text_col, self.key_col = text_col, key_col
        self._cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_col, n_tok = [], []
        for s in t[self.text_col].to_pylist():
            ids = self.bpe.encode(s or "", _cache=self._cache)
            ids_col.append(np.asarray(ids, dtype=np.int32))
            n_tok.append(len(ids))
        return pa.table({
            self.key_col: t[self.key_col],
            "ids": pa.array(ids_col, pa.list_(pa.int32())),
            "n_tok": pa.array(n_tok, pa.int64()),
        })


def bpe_tokenize(ds: rd.Dataset, merges: list[tuple[int, int]],
                 text_col: str = "text", key_col: str = "doc_id",
                 batch_size: int = 1024) -> rd.Dataset:
    return ds.map_batches(
        _worker_cached(BPEApplier, tuple(merges), text_col, key_col),
        batch_format="pyarrow", batch_size=batch_size)


class BPERoundTrip:
    """Verification stage: encode → decode each doc, HARD-assert the
    lossless property (reconstruction == concatenated pretokens), emit
    the reconstruction's character length — which a SQL oracle reproduces
    as ``length(array_to_string(regexp_extract_all(text, rx), ''))``, so
    the driver hash checks the real trained tokenizer's round trip."""

    def __init__(self, merges: list[tuple[int, int]],
                 text_col: str = "text", key_col: str = "doc_id"):
        self.bpe = BPE(list(merges))
        self.text_col, self.key_col = text_col, key_col
        self._cache: dict = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        lens = []
        for s in t[self.text_col].to_pylist():
            s = s or ""
            recon = self.bpe.decode(self.bpe.encode(s, _cache=self._cache))
            joined = "".join(_PRETOKEN_RX.findall(s))
            if recon != joined:
                raise AssertionError(
                    f"BPE round trip broke: {recon[:40]!r} != {joined[:40]!r}")
            lens.append(len(recon))
        return pa.table({self.key_col: t[self.key_col],
                         "n_tok": pa.array(lens, pa.int64())})
