"""Tar archive source — the reference's PRIMARY input format.

Mirrors `NewTarReader` (`/root/reference/tfdata/archive/tar.go:50-55`):
members `a/b.jpeg`, `a/b.cls` group under key `a/b` with member names = file
extensions (`tar.go:64-69`, `manager.go:57-63`); one Sample per key carrying
`__key__` (`greedyreader.go:31-37`). Duplicate member names are
last-write-wins (`manager.go:62`), duplicate-free tars emit one row per key.

Ray Data shape: ONE read task per tarball (the tarball is the shard — a
whole archive fits a task, exactly the Greedy reader's contract,
`greedyreader.go:16-21`); grouping-by-key inside one file is an in-task
dict build, no shuffle. Output is the LONG layout `(__key__, member,
data: binary)` — schema-stable regardless of which member sets appear —
plus `records()` to pivot to the wide per-sample layout (one binary
column per member extension) when the member set is known/uniform.
gzip (`*.tar.gz`/`*.tgz`) is sniffed from the filename like
`NewTarGzReader` (`tar.go:57-62`).
"""

from __future__ import annotations

import os
import tarfile

import pyarrow as pa

import ray.data as rd

KEY_COLUMN = "__key__"


def _split_name(name: str) -> tuple[str, str]:
    """(key, ext) following nameExtFromHeader (tar.go:64-69)."""
    base, ext = os.path.splitext(name)
    return base, ext.lstrip(".")


def read_tar_members(path: str) -> list[tuple[str, str, bytes]]:
    """All regular members of one tarball as (key, member_ext, data)."""
    mode = "r:gz" if path.endswith((".tar.gz", ".tgz")) else "r"
    out = []
    with tarfile.open(path, mode) as tf:
        for info in tf:
            if not info.isreg():
                continue
            key, ext = _split_name(info.name)
            data = tf.extractfile(info).read()
            out.append((key, ext, data))
    return out


def stream_tar_records(
    path: str, batch_rows: int = 256, stats: dict | None = None
):
    """TarSeekReader analog (`/root/reference/tfdata/archive/seekreader.go:16-138`):
    two-pass, bounded-memory streaming over one tarball.

    Pass 1 walks the headers only (tarfile skips member data when the body
    isn't extracted) and records each key's member count — ``prepareMeta``
    (`seekreader.go:66-88`). Pass 2 streams the data and EMITS a record the
    moment its last member is seen (`seekreader.go:125-133`), deleting it
    from the incomplete-record map — so memory is O(incomplete records +
    one output batch), never O(archive), and a 50 GB web-archive tarball
    flows through a single task as a stream of batches. A record's rows are
    never split across emitted batches (the ``records()`` pivot stays
    batch-local correct). gzip inputs stream too (decompressed twice — the
    price of two passes without a seekable index).

    Yields ``pyarrow.Table`` batches in the LONG (__key__, member, data)
    layout. ``stats`` (optional dict) receives ``max_pending`` — the high
    -water mark of the incomplete map — for memory-bound assertions."""
    mode = "r:gz" if path.endswith((".tar.gz", ".tgz")) else "r"
    counts: dict[str, int] = {}
    with tarfile.open(path, mode) as tf:
        for info in tf:
            if info.isreg():
                key, _ = _split_name(info.name)
                counts[key] = counts.get(key, 0) + 1

    pending: dict[str, list[tuple[str, bytes]]] = {}
    max_pending = 0
    keys: list[str] = []
    membs: list[str] = []
    datas: list[bytes] = []

    def flush() -> pa.Table:
        t = pa.table(
            {
                KEY_COLUMN: pa.array(keys, pa.string()),
                "member": pa.array(membs, pa.string()),
                "data": pa.array(datas, pa.large_binary()),
            }
        )
        keys.clear(), membs.clear(), datas.clear()
        return t

    with tarfile.open(path, mode) as tf:
        for info in tf:
            if not info.isreg():
                continue
            key, ext = _split_name(info.name)
            rec = pending.setdefault(key, [])
            rec.append((ext, tf.extractfile(info).read()))
            max_pending = max(max_pending, len(pending))
            if len(rec) >= counts[key]:  # complete → emit now, drop state
                for m, d in rec:
                    keys.append(key)
                    membs.append(m)
                    datas.append(d)
                del pending[key]
                if len(keys) >= batch_rows:
                    yield flush()
    # a tar whose pass-1/pass-2 views diverge (shouldn't happen) would
    # strand rows in pending; emit them rather than drop silently
    for key, rec in pending.items():
        for m, d in rec:
            keys.append(key)
            membs.append(m)
            datas.append(d)
    if keys:
        yield flush()
    if stats is not None:
        stats["max_pending"] = max_pending


def read_tar_samples_streaming(
    paths: str | list[str], batch_rows: int = 256
) -> rd.Dataset:
    """Streaming tar source: one task per tarball, but the task YIELDS
    batches incrementally (generator UDF) with bounded memory — the
    TarSeekReader path; ``read_tar_samples`` is the whole-archive Greedy
    path for small tars."""
    plist = [paths] if isinstance(paths, str) else list(paths)

    def parse(batch: pa.Table):
        for p in batch["path"].to_pylist():
            yield from stream_tar_records(p, batch_rows=batch_rows)

    return rd.from_items([{"path": p} for p in plist]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def read_tar_samples(paths: str | list[str]) -> rd.Dataset:
    """Dataset of (``__key__``, member, data) rows; one read task per
    tarball. Long layout: a key appears once per member (the reference's
    Sample dict, exploded)."""
    plist = [paths] if isinstance(paths, str) else list(paths)

    def parse(batch: pa.Table) -> pa.Table:
        keys, members, datas = [], [], []
        for p in batch["path"].to_pylist():
            for key, ext, data in read_tar_members(p):
                keys.append(key)
                members.append(ext)
                datas.append(data)
        return pa.table(
            {
                KEY_COLUMN: pa.array(keys, pa.string()),
                "member": pa.array(members, pa.string()),
                "data": pa.array(datas, pa.large_binary()),
            }
        )

    return rd.from_items([{"path": p} for p in plist]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def records(ds: rd.Dataset, members: list[str], require_complete: bool = True) -> rd.Dataset:
    """Pivot the long layout to one row per ``__key__`` with one binary
    column per member (the wide Record of `manager.go:6-9`). Batch-local —
    valid because one tarball's members never span read tasks (the Greedy
    contract). ``require_complete`` drops keys missing any member, the
    ``SameMembers`` completeness check (`manager.go:33-43`)."""

    def pivot(t: pa.Table) -> pa.Table:
        recs: dict[str, dict[str, bytes]] = {}
        keys_in_order: list[str] = []
        for key, member, data in zip(
            t[KEY_COLUMN].to_pylist(), t["member"].to_pylist(), t["data"].to_pylist()
        ):
            if key not in recs:
                recs[key] = {}
                keys_in_order.append(key)
            recs[key][member] = data  # duplicate member: last wins (manager.go:62)
        if require_complete:
            keys_in_order = [k for k in keys_in_order if all(m in recs[k] for m in members)]
        cols: dict[str, pa.Array] = {
            KEY_COLUMN: pa.array(keys_in_order, pa.string())
        }
        for m in members:
            cols[m] = pa.array([recs[k].get(m) for k in keys_in_order], pa.large_binary())
        return pa.table(cols)

    return ds.map_batches(pivot, batch_format="pyarrow")


def write_tar_samples(
    ds: rd.Dataset, out_path: str, members: list[str], key_col: str = KEY_COLUMN
) -> int:
    """Compat sink: wide records → one tarball (single writer, the
    WriteMessages serial path analog). Returns the number of samples."""
    n = 0
    with tarfile.open(out_path, "w") as tf:
        for row in ds.iter_rows():
            for m in members:
                data = row[m]
                if data is None:
                    continue
                info = tarfile.TarInfo(name=f"{row[key_col]}.{m}")
                info.size = len(data)
                import io

                tf.addfile(info, io.BytesIO(bytes(data)))
            n += 1
    return n
