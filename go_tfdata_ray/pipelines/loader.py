"""Training-loop consumer: epoch-reshuffled packed token micro-batches
streamed off the CDC lake — the loop this engine exists to feed.

Shape: merge-on-read ``scan`` (column-pruned to the token payload) →
optional quality filter → context-length packing → seeded
``random_shuffle`` (different permutation per training epoch, replayable
for resume) → ``iter_batches`` drain with backpressure. Nothing
materializes the corpus on the driver; the shuffle is the one all-to-all
and is exactly the reshuffle a training run needs anyway.

Determinism: same (seed, epoch) → identical batch stream (Ray's seeded
random_shuffle + deterministic packing input order via sort on the pack
key), so a preempted training job can re-derive its data order.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from ..cdc.engine import CDCEngine
from ..functions import pack


def training_batches(
    lake: str | CDCEngine,
    context_len: int = 2048,
    micro_batch: int = 8,
    seed: int = 0,
    epoch: int = 0,
    min_tokens: int = 1,
    eod_token: int = 0,
    at_version: int | None = None,
) -> Iterator[np.ndarray]:
    """Yield (micro_batch, context_len) int32 arrays of packed training
    tokens from the lake's current (or time-traveled) snapshot. The tail
    micro-batch may be short; callers drop or pad it per their recipe."""
    eng = lake if isinstance(lake, CDCEngine) else CDCEngine(lake)
    ds = eng.scan(columns=["doc_id", "tokens", "n_tok"], at_version=at_version,
                  where=[("n_tok", ">=", min_tokens)])
    packed = pack.pack_sequences(ds, context_len=context_len, eod_token=eod_token)
    packed = packed.random_shuffle(seed=seed * 1_000_003 + epoch)
    for batch in packed.iter_batches(batch_size=micro_batch, batch_format="pyarrow"):
        toks = batch["tokens"].combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        yield flat.reshape(len(toks), context_len)
