"""Trainable quality classifier: multinomial Naive Bayes over hashed word
features — the published quality-filter recipe (GPT-3's LR-over-hashed
-features / CCNet's fasttext stage) in its simplest closed-form trainable
shape, Ray-Data-first.

Why NB and not SGD: training reduces to ONE streaming pass of sufficient
statistics — per-class hashed-feature counts, a SUM-fold linear sketch
exactly like the count-min matrix in `functions/sketch.py` — so the train
is embarrassingly parallel with no iteration, no parameter server and no
driver-side corpus state: each batch emits a fixed-size dense count
matrix (n_classes × n_features int64), partials fold two-level past
``max_fold_rows`` rows (hash-sharded per-shard sums, then a coalesce of
the shard rows) so no task is ever fed #blocks × matrix bytes, and the
driver holds only the final broadcast-sized model (float32 log-probs,
~0.5 MB at the 2^16 default).

Scoring is one `map_batches` pass: per-token log-likelihood gather +
`np.bincount(doc_of, weights=...)` per class — vectorized, stateless,
model shipped once via ``ray.put`` and cached per worker.

Reference parity: go-tfdata has no trained classifier — beyond-parity,
companion to the heuristic scorer (`functions/text.py:quality`) and the
LM perplexity filter (`functions/lm.py`).
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.exchange import exchange_coalesce_map, exchange_group_map
from ..stages.joins import _cached_get

__all__ = ["train_nb_classifier", "score_nb", "filter_by_classifier"]

_WORD_RX = re.compile(r"[a-z0-9]+")


def _feature_counts(
    texts: np.ndarray, n_features: int
) -> tuple[np.ndarray, np.ndarray]:
    """Flat (feature_id, doc_row) for every word occurrence — the hashing
    trick: feature = siphash(word) % n_features (fixed key, stable across
    processes; collisions are the standard accepted noise)."""
    words: list[str] = []
    counts = np.empty(len(texts), np.int64)
    for i, txt in enumerate(texts):
        w = _WORD_RX.findall(str(txt).lower())
        counts[i] = len(w)
        words.extend(w)
    if not words:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    f = (pd.util.hash_array(np.array(words, dtype=object), categorize=False)
         % np.uint64(n_features)).astype(np.int64)
    doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    return f, doc_of


def train_nb_classifier(
    ds: rd.Dataset,
    classes: list[str],
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 16,
    alpha: float = 1.0,
    max_fold_rows: int = 256,
) -> dict[str, Any]:
    """One-pass distributed train → model dict. ``classes`` fixes the
    label universe up front (rows with other labels raise — a loud
    contract error beats silently dropped training data). Laplace
    smoothing ``alpha``; returns ``{classes, n_features, log_prior
    (C float64), log_prob (C × F float32), n_docs}``."""
    C = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}

    def partial(t: pa.Table) -> pa.Table:
        labels = t[label_col].to_numpy(zero_copy_only=False)
        li = np.empty(len(labels), np.int64)
        for r, lab in enumerate(labels):
            try:
                li[r] = cls_idx[lab]
            except KeyError:
                raise ValueError(
                    f"label {lab!r} not in declared classes {classes}")
        f, doc_of = _feature_counts(
            t[text_col].to_numpy(zero_copy_only=False), n_features)
        cm = np.zeros((C, n_features), dtype=np.int64)
        if len(f):
            # per-token class = its doc's class; one bincount per class
            tok_cls = li[doc_of]
            for c in range(C):
                sel = f[tok_cls == c]
                if len(sel):
                    cm[c] += np.bincount(sel, minlength=n_features)
        docs = np.bincount(li, minlength=C).astype(np.int64)
        return pa.table({
            "_cm": pa.array([cm.ravel().tobytes()], pa.large_binary()),
            "_docs": pa.array([docs.tolist()], pa.list_(pa.int64())),
        })

    def _sum_rows(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        cm = np.zeros(C * n_features, dtype=np.int64)
        docs = np.zeros(C, dtype=np.int64)
        for i in range(t.num_rows):
            cm += np.frombuffer(t["_cm"][i].as_py(), dtype=np.int64)
            docs += np.asarray(t["_docs"][i].as_py(), dtype=np.int64)
        return cm, docs

    def prefold(t: pa.Table) -> pa.Table:
        cm, docs = _sum_rows(t)
        return pa.table({
            "_cm": pa.array([cm.tobytes()], pa.large_binary()),
            "_docs": pa.array([docs.tolist()], pa.list_(pa.int64())),
        })

    def fold(t: pa.Table) -> pa.Table:
        cm, docs = _sum_rows(t)
        return pa.table({
            "_cm": pa.array([cm.tobytes()], pa.large_binary()),
            "_docs": pa.array([docs.tolist()], pa.list_(pa.int64())),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    n_rows = partials.count()
    if n_rows > max_fold_rows:
        # two-level fold (the count-min pattern, sketch.py): hash-shard
        # the partial rows, sum per shard, coalesce the shard rows — no
        # task ingests #blocks × C×F bytes at crawl-scale block counts
        n_shards = min(-(-n_rows // max_fold_rows), 512)

        def add_shard(t: pa.Table) -> pa.Table:
            keys = np.asarray(t["_cm"].to_pylist(), dtype=object)
            sh = (pd.util.hash_array(keys, categorize=False)
                  % np.uint64(n_shards)).astype(np.int64)
            return t.append_column("_shard", pa.array(sh))

        partials = exchange_group_map(
            partials.map_batches(add_shard, batch_format="pyarrow"),
            lambda t: prefold(t.drop_columns(["_shard"])),
            n_shards, batch_format="pyarrow",
        )
    final = exchange_coalesce_map(partials, fold, batch_format="pyarrow")
    cm_b, docs_l = None, None
    for b in final.iter_batches(batch_format="pyarrow"):
        if b.num_rows:
            cm_b = b["_cm"][0].as_py()
            docs_l = b["_docs"][0].as_py()
    if cm_b is None:
        raise ValueError("empty training set")
    cm = np.frombuffer(cm_b, dtype=np.int64).reshape(C, n_features)
    docs = np.asarray(docs_l, dtype=np.int64)
    if (docs == 0).any():
        missing = [classes[i] for i in np.flatnonzero(docs == 0)]
        raise ValueError(f"no training docs for classes {missing}")
    totals = cm.sum(axis=1, keepdims=True).astype(np.float64)
    log_prob = np.log((cm + alpha) / (totals + alpha * n_features))
    log_prior = np.log(docs / docs.sum())
    return {
        "classes": list(classes),
        "n_features": int(n_features),
        "log_prior": log_prior,
        "log_prob": log_prob.astype(np.float32),
        "n_docs": int(docs.sum()),
    }


def score_nb(
    ds: rd.Dataset,
    model: dict[str, Any],
    text_col: str = "text",
) -> rd.Dataset:
    """Append ``pred`` (argmax class) and ``margin`` (top-1 minus top-2
    joint log-likelihood — 0 margin = toss-up) to every row. One
    stateless vectorized pass; the model ships once (``ray.put``) and is
    cached per worker process."""
    ref = ray.put(model)

    def score(t: pa.Table) -> pa.Table:
        m = _cached_get(ref)
        C = len(m["classes"])
        f, doc_of = _feature_counts(
            t[text_col].to_numpy(zero_copy_only=False), m["n_features"])
        scores = np.tile(m["log_prior"], (t.num_rows, 1))
        lp = m["log_prob"]
        for c in range(C):
            if len(f):
                scores[:, c] += np.bincount(
                    doc_of, weights=lp[c][f].astype(np.float64),
                    minlength=t.num_rows)
        order = np.argsort(-scores, axis=1, kind="stable")
        best = order[:, 0]
        margin = (scores[np.arange(len(best)), best]
                  - scores[np.arange(len(best)), order[:, 1]]
                  if C > 1 else np.zeros(len(best)))
        preds = np.asarray(m["classes"], dtype=object)[best]
        return (t.append_column("pred", pa.array(preds, pa.string()))
                 .append_column("margin", pa.array(margin, pa.float64())))

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def filter_by_classifier(
    ds: rd.Dataset,
    model: dict[str, Any],
    keep: str,
    text_col: str = "text",
    min_margin: float = 0.0,
) -> rd.Dataset:
    """Keep rows the classifier assigns to ``keep`` with at least
    ``min_margin`` log-likelihood separation — the curation-stage form
    (columns pass through unchanged; the score columns are not kept)."""
    if keep not in model["classes"]:
        raise ValueError(f"keep={keep!r} not in model classes")
    ref = ray.put(model)

    def gate(t: pa.Table) -> pa.Table:
        m = _cached_get(ref)
        C = len(m["classes"])
        ki = m["classes"].index(keep)
        f, doc_of = _feature_counts(
            t[text_col].to_numpy(zero_copy_only=False), m["n_features"])
        scores = np.tile(m["log_prior"], (t.num_rows, 1))
        lp = m["log_prob"]
        for c in range(C):
            if len(f):
                scores[:, c] += np.bincount(
                    doc_of, weights=lp[c][f].astype(np.float64),
                    minlength=t.num_rows)
        others = np.delete(scores, ki, axis=1)
        margin = scores[:, ki] - (others.max(axis=1)
                                  if C > 1 else np.zeros(t.num_rows))
        return t.filter(pa.array(margin >= min_margin))

    return ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
