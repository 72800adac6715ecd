"""Deterministic WAL (change-log) generation and discovery.

The WAL is the CDC analog of the reference's tar byte stream: an ordered
sequence of keyed records turned into `__key__`-keyed Samples
(`/root/reference/tfdata/archive/greedyreader.go:33-37`,
`/root/reference/tfdata/archive/seekreader.go:90-137`). Here the stream is a
sequence of Parquet *segments* (one per epoch / micro-batch), each holding
events ``(seq, epoch, op, doc_id, tokens, n_tok, source)`` per
BASELINE.json's ``input_hint``.

Everything is generated deterministically from ``(n_events, n_keys, seed)``
with index-derived values — no wall clock, no RNG state — so the same
parameters always produce byte-identical segments (FIXTURES.md §2).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TOKEN_VOCAB = 50257
_SOURCES = np.array(["web", "books", "code", "wiki"])

# Arrow schema of a WAL segment (the lake's user-facing schema is the same
# minus seq/epoch/op). Deletes carry tokens=[] / n_tok=0 (payload ignored).
WAL_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("epoch", pa.int32()),
        ("op", pa.string()),
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)

LAKE_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


@dataclass(frozen=True)
class WalParams:
    n_events: int
    n_keys: int
    num_epochs: int = 4
    seed: int = 42
    hot_frac: float = 0.10
    n_hot: int = 8
    max_len: int = 64
    dup_rate: float = 0.0
    key_mode: str = "zipf"  # "zipf" (hot-key skew) | "roundrobin" (distinct-first)
    shard_rows: int = 32768  # events per shard file within an epoch segment
    op_mode: str = "first_insert"  # "first_insert" (global first-occurrence scan)
    # | "hash" (pure per-event hash → range-parallel generation; I/U both
    #   upsert so final-state semantics are identical)
    version: int = 4  # bump to invalidate cached generated dirs


def synth_events(p: WalParams) -> pa.Table:
    return synth_range(p, 0, p.n_events)


def synth_range(p: WalParams, lo: int, hi: int) -> pa.Table:
    """Vectorized synthesis of events with seq in [lo, hi) (no epoch split).

    Rules follow FIXTURES.md §2: zipf-ish hot-key skew (~hot_frac of events
    hit n_hot keys), first event per key is 'I', later ones 'U'/'D' ≈ 95/5,
    token payload parameterized by (key, seq) so every update changes it.
    Every value is a pure function of (seq, params), so disjoint ranges can
    be synthesized in parallel tasks — except op_mode="first_insert", whose
    global first-occurrence scan requires the full range (lo=0, hi=n)."""
    if p.op_mode == "first_insert" and (lo, hi) != (0, p.n_events):
        raise ValueError("first_insert op_mode cannot be range-synthesized")
    n = hi - lo
    seq = np.arange(lo, hi, dtype=np.int64)
    if p.key_mode == "roundrobin":
        key_idx = seq % p.n_keys
    else:
        r = (seq * 2654435761 + p.seed) % 1000
        hot = r < int(p.hot_frac * 1000)
        n_cold = max(p.n_keys - p.n_hot, 1)
        key_idx = np.where(
            hot,
            (seq * 48271 + p.seed) % max(p.n_hot, 1),
            p.n_hot + (seq * 1103515245 + 12345 + p.seed) % n_cold,
        ).astype(np.int64)

    d = (seq * 48271 + p.seed * 7) % 100
    if p.op_mode == "hash":
        # range-parallel op rule: I/U both upsert, so only 'D' placement
        # matters for the final state; ratios ≈ 70/25/5
        op = np.where(d < 70, "I", np.where(d < 95, "U", "D"))
    else:
        first_mask = np.zeros(n, dtype=bool)
        _, first_pos = np.unique(key_idx, return_index=True)
        first_mask[first_pos] = True
        op = np.where(first_mask, "I", np.where(d < 5, "D", "U"))
    is_del = op == "D"

    lengths = np.where(
        is_del, 0, 1 + (key_idx * 2654435761 + seq * 97 + p.seed) % p.max_len
    ).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    j = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    base = np.repeat(key_idx * 31 + seq, lengths)
    vals = ((base + j * 17) % TOKEN_VOCAB).astype(np.int32)
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(vals, type=pa.int32())
    )

    doc_id = np.char.mod("doc-%08d", key_idx)
    source = _SOURCES[(key_idx % 4).astype(np.int64)]
    epoch_size = -(-n // p.num_epochs)  # ceil
    epoch = (seq // epoch_size).astype(np.int32)

    return pa.table(
        {
            "seq": pa.array(seq),
            "epoch": pa.array(epoch),
            "op": pa.array(op.astype(object), type=pa.string()),
            "doc_id": pa.array(doc_id.astype(object), type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(lengths.astype(np.int32)),
            "source": pa.array(source.astype(object), type=pa.string()),
        },
        schema=WAL_SCHEMA,
    )


def _inject_duplicates(t: pa.Table, p: WalParams) -> pa.Table:
    """Re-deliver an exact copy of a deterministic subset of events in the
    NEXT epoch's segment (same seq — at-least-once delivery). Idempotency
    (north rule) means the final state must be unchanged."""
    n_dup = int(p.n_events * p.dup_rate)
    if n_dup <= 0:
        return t
    step = max(p.n_events // n_dup, 1)
    pick = np.arange(0, p.n_events, step)[:n_dup]
    dup = t.take(pa.array(pick))
    max_epoch = int(t["epoch"][len(t) - 1].as_py())
    bumped = np.minimum(np.asarray(dup["epoch"]) + 1, max_epoch).astype(np.int32)
    dup = dup.set_column(1, "epoch", pa.array(bumped))
    return pa.concat_tables([t, dup]).sort_by([("epoch", "ascending"), ("seq", "ascending")])


def generate_wal(out_dir: str, p: WalParams) -> list[str]:
    """Write one Parquet segment per epoch under ``out_dir``; idempotent —
    if a dir with identical params already exists it is reused. Returns the
    ordered list of segment paths."""
    meta_path = os.path.join(out_dir, "_WAL_META.json")
    want = asdict(p)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("params") == want:
            return [os.path.join(out_dir, f) for f in meta["files"]]
        shutil.rmtree(out_dir)

    t = synth_events(p)
    t = _inject_duplicates(t, p)
    tmp = f"{out_dir}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    files = []
    epochs = np.asarray(t["epoch"])
    for e in range(p.num_epochs):
        seg = t.filter(pa.array(epochs == e))
        # An epoch segment is a DIRECTORY of shard files (as a real WAL is:
        # many producers append concurrently) — read_parquet then fans one
        # epoch out as one task per shard, so apply is read-parallel.
        seg_dir = f"epoch-{e:05d}"
        os.makedirs(os.path.join(tmp, seg_dir))
        for si, lo in enumerate(range(0, max(seg.num_rows, 1), p.shard_rows)):
            shard = seg.slice(lo, p.shard_rows)
            name = os.path.join(seg_dir, f"shard-{si:05d}.parquet")
            pq.write_table(shard, os.path.join(tmp, name), row_group_size=8192,
                           use_dictionary=False, compression="lz4")
            files.append(name)
    with open(os.path.join(tmp, "_WAL_META.json"), "w") as f:
        json.dump({"params": want, "files": files}, f, indent=1)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost a race; reuse winner's dir
    return [os.path.join(out_dir, f) for f in files]


def _write_shard(p: WalParams, lo: int, hi: int, path: str) -> int:
    t = synth_range(p, lo, hi)
    pq.write_table(t, path, row_group_size=8192, use_dictionary=False, compression="lz4")
    return hi - lo


def generate_wal_parallel(out_dir: str, p: WalParams) -> list[str]:
    """Range-parallel WAL generation: one Ray task per shard group. Needs
    op_mode='hash' (no global first-occurrence scan) and dup_rate=0.
    Deterministic — identical output for identical params, any task order."""
    if p.op_mode != "hash" or p.dup_rate != 0:
        raise ValueError("parallel generation requires op_mode='hash', dup_rate=0")
    meta_path = os.path.join(out_dir, "_WAL_META.json")
    want = asdict(p)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("params") == want:
            return [os.path.join(out_dir, f) for f in meta["files"]]
        shutil.rmtree(out_dir)

    import ray

    epoch_size = -(-p.n_events // p.num_epochs)
    tmp = f"{out_dir}.tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    gen = ray.remote(_write_shard)
    refs, files = [], []
    for e in range(p.num_epochs):
        seg_dir = f"epoch-{e:05d}"
        os.makedirs(os.path.join(tmp, seg_dir))
        e_lo, e_hi = e * epoch_size, min((e + 1) * epoch_size, p.n_events)
        for si, lo in enumerate(range(e_lo, e_hi, p.shard_rows)):
            name = os.path.join(seg_dir, f"shard-{si:05d}.parquet")
            refs.append(gen.remote(p, lo, min(lo + p.shard_rows, e_hi),
                                   os.path.join(tmp, name)))
            files.append(name)
    ray.get(refs)
    with open(os.path.join(tmp, "_WAL_META.json"), "w") as f:
        json.dump({"params": want, "files": files}, f, indent=1)
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return [os.path.join(out_dir, f) for f in files]


OPEN_MARKER = "_OPEN"


def open_segment(wal_dir: str, epoch: int) -> str:
    """Producer API: start a new epoch segment. The segment stays invisible
    to ``list_segments`` (and therefore to ``CDCEngine.tail``) until
    ``seal_segment`` — the micro-batch completeness barrier, the CDC analog
    of the reference's emit-only-when-record-complete
    (`/root/reference/tfdata/archive/seekreader.go:125-133`)."""
    d = os.path.join(wal_dir, f"epoch-{epoch:05d}")
    if os.path.isdir(d):  # re-opening an existing segment (same producer)
        with open(os.path.join(d, OPEN_MARKER), "w"):
            pass
        return d
    # Atomic creation: the directory appears with the _OPEN marker already
    # inside, so a concurrent tail poll can never observe a sealed-looking,
    # shard-less segment in the mkdir→marker window (which apply_epoch would
    # commit EMPTY, permanently skipping the epoch's real data).
    os.makedirs(wal_dir, exist_ok=True)
    tmp = f"{d}.opening-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, OPEN_MARKER), "w"):
        pass
    try:
        os.rename(tmp, d)
    except OSError:  # lost a race with another producer of the same epoch
        shutil.rmtree(tmp, ignore_errors=True)
        with open(os.path.join(d, OPEN_MARKER), "w"):
            pass
    return d


def seal_segment(seg_dir: str) -> None:
    """Producer API: mark the segment complete (atomic unlink)."""
    os.unlink(os.path.join(seg_dir, OPEN_MARKER))


def first_open_epoch(wal_dir: str) -> int | None:
    """Smallest segment id still carrying the ``_OPEN`` marker, or None.

    The consumer's ORDERING BARRIER: with concurrent producers on claimed
    ids (`cdc/ingest.py:_claim_epoch`), a producer holding a LOWER id may
    seal after a faster producer seals a higher one. The scalar ``wal_hwm``
    skip would then never revisit the lower id — and its seqs sit below
    the replay watermarks the higher epoch already raised — silently
    dropping the whole drop. Consumers must therefore not apply any sealed
    segment ABOVE the smallest still-open id; they wait for it to seal (or
    for the abandoned claim to be vacuumed by the operator)."""
    return segments_with_barrier(wal_dir)[1]


def segments_with_barrier(wal_dir: str) -> tuple[list[tuple[int, list[str]]], int | None]:
    """``(list_segments(wal_dir), first-open-id)`` from ONE directory
    snapshot. Consumers must derive both from the same listing: computing
    the barrier in a separate earlier pass leaves a window where a claim
    lands after the barrier scan but its faster sibling seals before the
    segment scan — the stale barrier would admit the sibling and the
    replay watermarks would then silently drop the slower claim's drop.
    (Within one listing, the slower claim's directory exists strictly
    before the faster sibling's id is even allocated, so a listing that
    shows the sealed sibling also shows the open claim.)"""
    segs = []
    lo: int | None = None
    if not os.path.isdir(wal_dir):
        return segs, lo
    for name in sorted(os.listdir(wal_dir)):
        m = re.fullmatch(r"epoch-(\d+)", name)
        if m and os.path.isdir(os.path.join(wal_dir, name)):
            e = int(m.group(1))
            if os.path.exists(os.path.join(wal_dir, name, OPEN_MARKER)):
                if lo is None or e < lo:
                    lo = e
                continue
            shards = sorted(
                os.path.join(wal_dir, name, s)
                for s in os.listdir(os.path.join(wal_dir, name))
                # quar-* sidecars are expectation-quarantined rows living
                # WITH their segment (same claim/abandon/vacuum lifecycle)
                # — triage data, never WAL events
                if s.endswith(".parquet") and not s.startswith("quar-")
            )
            segs.append((e, shards))
            continue
        m = re.fullmatch(r"epoch-(\d+)\.parquet", name)
        if m:
            segs.append((int(m.group(1)), [os.path.join(wal_dir, name)]))
    return segs, lo


def list_segments(wal_dir: str) -> list[tuple[int, list[str]]]:
    """(epoch, shard_paths) pairs in epoch order. Accepts both layouts:
    ``epoch-N/`` shard directories and legacy single ``epoch-N.parquet``.
    Unsealed segments (containing ``_OPEN``) are skipped — a consumer never
    sees a half-written micro-batch."""
    return segments_with_barrier(wal_dir)[0]


# --- sf-linked parameters -------------------------------------------------

def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.01


def wal_params_for_sf(sf_dir: str, **overrides) -> WalParams:
    """Scale-linked deterministic WAL: sf0.01 → 60k events over 15k keys."""
    sf = sf_from_dir(sf_dir)
    n_events = max(int(6_000_000 * sf), 1000)
    kw = dict(n_events=n_events, n_keys=max(n_events // 4, 16), num_epochs=4, seed=42)
    kw.update(overrides)
    return WalParams(**kw)


def wal_dir_for_sf(sf_dir: str, root: str = "/tmp/graft_wal") -> str:
    sf = sf_from_dir(sf_dir)
    return os.path.join(root, f"sf{sf:g}-v1")


def ensure_wal_for_sf(sf_dir: str, **overrides) -> tuple[str, list[str]]:
    d = wal_dir_for_sf(sf_dir)
    files = generate_wal(d, wal_params_for_sf(sf_dir, **overrides))
    return d, files
