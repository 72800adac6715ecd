"""Sequence packing: fold variable-length token documents into fixed
``context_len`` training sequences — the canonical last step of a
pre-tokenized-lake pipeline (the lake schema IS ``doc_id, tokens, n_tok``).

Packing is batch-local (each worker packs its shard greedily in arrival
order) — the standard scalable approach: global bin-packing would be an
all-to-all for a few % fill improvement. Every output row is exactly
``context_len`` tokens; the final partial sequence of each batch is padded
with ``pad_token`` (fill ratio is reported per sequence).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def pack_batch(
    t: pa.Table,
    context_len: int,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    eod_token: int = 0,
    pad_token: int = 0,
) -> pa.Table:
    """Vectorized packing of one batch: concat all docs (each followed by
    one EOD token), slice into context_len windows, pad the tail."""
    toks = t[tokens_col].combine_chunks()
    flat = toks.flatten().to_numpy(zero_copy_only=False)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offs)
    n_docs = len(lens)
    if n_docs == 0:
        return pa.table(
            {
                "seq_id": pa.array([], pa.string()),
                tokens_col: pa.array([], pa.list_(pa.int32())),
                "n_docs": pa.array([], pa.int32()),
                "fill_ratio": pa.array([], pa.float64()),
            }
        )
    # interleave EOD after each doc: build output via index mapping
    total = int(lens.sum()) + n_docs  # + one EOD per doc
    stream = np.full(total, eod_token, dtype=np.int64)
    # positions of doc tokens in the stream: each doc shifted by its index
    # (number of EODs inserted before it)
    src_pos = np.arange(int(lens.sum()), dtype=np.int64)
    doc_of_tok = np.repeat(np.arange(n_docs), lens)
    stream[src_pos + doc_of_tok] = flat
    # doc start positions in the stream (for n_docs per window)
    doc_starts = offs[:-1] + np.arange(n_docs)

    n_seq = -(-total // context_len)
    padded = np.full(n_seq * context_len, pad_token, dtype=np.int64)
    padded[:total] = stream
    mat = padded.reshape(n_seq, context_len)
    # docs starting in each window
    win_of_start = doc_starts // context_len
    n_docs_per = np.bincount(win_of_start, minlength=n_seq).astype(np.int32)
    fill = np.full(n_seq, 1.0)
    fill[-1] = (total - (n_seq - 1) * context_len) / context_len
    first_key = str(t[key_col][0].as_py())
    seq_ids = np.array([f"{first_key}:{i}" for i in range(n_seq)], dtype=object)
    return pa.table(
        {
            "seq_id": pa.array(seq_ids, pa.string()),
            tokens_col: pa.array(list(mat.astype(np.int32)), pa.list_(pa.int32())),
            "n_docs": pa.array(n_docs_per),
            "fill_ratio": pa.array(fill, pa.float64()),
        }
    )


def chunk_batch(
    t: pa.Table,
    context_len: int,
    overlap: int = 0,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
) -> pa.Table:
    """Flat-map chunking of one batch: split each document's tokens into
    ``context_len`` windows advancing by ``stride = context_len -
    overlap`` (the standard long-document pretraining shape — each
    window repeats the previous window's last ``overlap`` tokens so no
    boundary context is lost). The final window of a doc is SHORT, not
    padded — padding/packing is ``pack_sequences``'s job downstream.
    Vectorized: window starts come from one arange per batch; every
    chunk is a zero-copy ListArray slice view over the batch's flat
    token buffer."""
    if not 0 <= overlap < context_len:
        raise ValueError("need 0 <= overlap < context_len")
    stride = context_len - overlap
    toks = t[tokens_col].combine_chunks()
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    n_tok = np.diff(offs)
    # chunks per doc: 1 for empty/short docs, else ceil((n-overlap)/stride)
    n_chunks = np.maximum(1, -(-(n_tok - overlap) // stride)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_chunks)
    # window index within each doc: global arange minus each doc's base
    base = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_idx = np.arange(len(doc_idx), dtype=np.int64) - base[doc_idx]
    starts = offs[doc_idx] + chunk_idx * stride
    ends = np.minimum(starts + context_len, offs[doc_idx] + n_tok[doc_idx])
    out_offs = np.concatenate(([0], np.cumsum(ends - starts)))
    if out_offs[-1] > np.iinfo(np.int32).max:  # list<int32> offset ceiling
        raise ValueError(
            f"chunk_batch output ({out_offs[-1]} tokens) overflows int32 "
            "list offsets — lower batch_size (overlap inflates output by "
            f"~{context_len / max(1, stride):.1f}x)")
    # gather the windows into one flat buffer (windows may overlap, so a
    # pure offsets-view is not possible; one vectorized take per batch)
    take_idx = np.concatenate(
        [np.arange(s, e, dtype=np.int64) for s, e in zip(starts, ends)]
    ) if len(starts) else np.zeros(0, np.int64)
    values = flat.take(pa.array(take_idx, pa.int64()))
    chunks = pa.ListArray.from_arrays(
        pa.array(out_offs, pa.int32()), values)
    return pa.table({
        key_col: t[key_col].take(pa.array(doc_idx, pa.int64())),
        "chunk_idx": pa.array(chunk_idx, pa.int64()),
        tokens_col: chunks,
        "n_tok": pa.array((ends - starts).astype(np.int32), pa.int32()),
    })


def chunk_documents(
    ds: rd.Dataset,
    context_len: int = 2048,
    overlap: int = 0,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    batch_size: int = 4096,
) -> rd.Dataset:
    """Distributed long-document chunking (flat-map shape: output rows ≥
    input rows); pairs with ``pack_sequences`` downstream."""
    import functools

    return ds.map_batches(
        functools.partial(
            chunk_batch, context_len=context_len, overlap=overlap,
            tokens_col=tokens_col, key_col=key_col,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )


def pack_sequences(
    ds: rd.Dataset,
    context_len: int = 2048,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    eod_token: int = 0,
    pad_token: int = 0,
    batch_size: int = 4096,
) -> rd.Dataset:
    import functools

    return ds.map_batches(
        functools.partial(
            pack_batch, context_len=context_len, tokens_col=tokens_col,
            key_col=key_col, eod_token=eod_token, pad_token=pad_token,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )
