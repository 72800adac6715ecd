"""Training-loop consumer: epoch-reshuffled packed token micro-batches
streamed off the CDC lake — the loop this engine exists to feed.

Shape: merge-on-read ``scan`` (column-pruned to the token payload) →
optional quality filter → context-length packing → per-epoch
``randomize_block_order(seed)`` + windowed local shuffle in
``iter_batches`` → drain with backpressure. Nothing materializes the
corpus on the driver, and — the 100 TB point — NO per-epoch all-to-all:
a full ``random_shuffle`` of the packed corpus every epoch re-exchanges
the whole dataset; block-order randomization moves only metadata, and
the ``local_shuffle_buffer_size`` window decorrelates rows within the
stream at zero exchange cost (the standard two-level training-reshuffle:
global block permutation × windowed row permutation).

Determinism: same (seed, epoch) → identical batch stream (seeded block
order + seeded local shuffle over a deterministic packing input order),
so a preempted training job can re-derive its data order; a different
epoch derives a different permutation from the same seed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..cdc.engine import CDCEngine
from ..functions import pack


def _weighted_mix(source_weights: dict[str, float], epoch_seed: int):
    """Per-batch deterministic source mixing: a doc from source s with
    weight w contributes floor(w) copies plus one more with probability
    frac(w), decided by a fixed-key hash of its doc_id salted with the
    (seed, epoch) derivation — so the mix is exactly reproducible per
    (seed, epoch), re-rolls across epochs (fresh subsample of the
    downweighted sources each epoch, the standard mixing recipe), and
    needs NO shuffle: it's a pure per-batch filter/repeat."""
    salt = np.uint64((epoch_seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03)
                     % (1 << 64))

    def mix(t: pa.Table) -> pa.Table:
        # dictionary-encode: the weight lookup runs once per DISTINCT
        # source (a handful), then fancy-indexes per row — no Python loop
        enc = pc.dictionary_encode(t["source"].combine_chunks())
        wd = np.array([source_weights.get(s, 1.0)
                       for s in enc.dictionary.to_pylist()] + [1.0])
        if (wd < 0).any():
            raise ValueError("source weights must be >= 0")
        idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        w = wd[idx.astype(np.int64)]  # -1 (null source) → default 1.0
        base = np.floor(w).astype(np.int64)
        frac = w - base
        h = pd.util.hash_array(
            t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False),
            categorize=False)
        h = (h ^ salt) * np.uint64(0x2545F4914F6CDD1D)  # epoch-salted remix
        extra = (h.astype(np.float64) / float(1 << 64)) < frac
        n = base + extra.astype(np.int64)
        # copy-number-major order: np.repeat would emit a doc's copies
        # ADJACENTLY, and packing is arrival-ordered, so both copies of a
        # short doc would land inside the same context window. Emitting
        # all first copies, then all second copies, ... separates a doc's
        # copies by the whole batch's worth of other docs.
        max_copies = int(n.max()) if len(n) else 0
        order = np.concatenate(
            [np.flatnonzero(n > c) for c in range(max_copies)]
        ) if max_copies else np.empty(0, dtype=np.int64)
        return t.take(pa.array(order))

    return mix


def training_batches(
    lake: str | CDCEngine,
    context_len: int = 2048,
    micro_batch: int = 8,
    seed: int = 0,
    epoch: int = 0,
    min_tokens: int = 1,
    eod_token: int = 0,
    at_version: int | None = None,
    source_weights: dict[str, float] | None = None,
) -> Iterator[np.ndarray]:
    """Yield (micro_batch, context_len) int32 arrays of packed training
    tokens from the lake's current (or time-traveled) snapshot. The tail
    micro-batch may be short; callers drop or pad it per their recipe.

    ``source_weights``: per-``source`` mixing weights (missing sources
    default to 1.0). w<1 subsamples deterministically, w>1 repeats docs
    (floor(w) copies + one more with probability frac(w)); the draw is a
    per-(seed, epoch) fixed-key hash of doc_id, so the stream stays
    exactly replayable for resume."""
    eng = lake if isinstance(lake, CDCEngine) else CDCEngine(lake)
    cols = ["doc_id", "tokens", "n_tok"]
    if source_weights:
        cols.append("source")
    ds = eng.scan(columns=cols, at_version=at_version,
                  where=[("n_tok", ">=", min_tokens)])
    epoch_seed = seed * 1_000_003 + epoch
    if source_weights:
        ds = ds.map_batches(_weighted_mix(source_weights, epoch_seed),
                            batch_format="pyarrow", zero_copy_batch=True)
    packed = pack.pack_sequences(ds, context_len=context_len, eod_token=eod_token)
    packed = packed.randomize_block_order(seed=epoch_seed)
    for batch in packed.iter_batches(batch_size=micro_batch, batch_format="pyarrow",
                                     local_shuffle_buffer_size=max(micro_batch * 64, 256),
                                     local_shuffle_seed=epoch_seed):
        toks = batch["tokens"].combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        yield flat.reshape(len(toks), context_len)
