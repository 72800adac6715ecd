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
    epoch_seed = seed * 1_000_003 + epoch
    packed = packed.randomize_block_order(seed=epoch_seed)
    for batch in packed.iter_batches(batch_size=micro_batch, batch_format="pyarrow",
                                     local_shuffle_buffer_size=max(micro_batch * 64, 256),
                                     local_shuffle_seed=epoch_seed):
        toks = batch["tokens"].combine_chunks()
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
        yield flat.reshape(len(toks), context_len)
