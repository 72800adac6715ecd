"""JSONL document-drop source.

The other common crawl-pipeline drop format besides WARC
(`sources/warc.py`): one JSON object per line, usually gzipped. Two
paths with one signature:

- ``strict=True`` (default): delegates to ``ray.data.read_json`` —
  pyarrow's C++ newline-delimited JSON reader, block-splittable and
  vectorized; ``.gz`` handled by Arrow's compression inference. Any
  malformed line aborts the read (correct for lake-owned exports).
- ``strict=False``: web junk tolerated — one streaming task per file,
  malformed / non-object lines SKIPPED (the per-line ``json.loads``
  loop is inherent string work, same adjudication as the tokenizer's
  regex loop); batches bounded at ``batch_rows``. ``columns`` is
  REQUIRED here, and every column types as STRING unless ``types``
  declares it otherwise — per-batch type INFERENCE would make block
  schemas depend on where batch boundaries fall (one junk value in
  one batch would flip that batch's column to string while its
  neighbors stay int, failing any downstream schema unification —
  write_parquet, union, sort). With ``types={"n": pa.int64()}`` a
  value that won't convert becomes null in that typed column.
  Tolerant means every well-formed LINE survives with a
  batch-invariant schema. Use ``scan_bad_lines`` for the drop-quality
  report — a separate pass by design, so the document stream stays
  schema-clean.
"""

from __future__ import annotations

import gzip
import io
import json
from typing import Iterator

import pyarrow as pa

import ray.data as rd


def _open_text(path: str):
    raw = open(path, "rb")
    magic = raw.read(2)
    raw.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(raw, "rt", encoding="utf-8", errors="replace")
    return io.TextIOWrapper(raw, encoding="utf-8", errors="replace")


def _iter_objects(path: str) -> Iterator[dict | None]:
    """Parsed object per non-blank line; ``None`` for a malformed one."""
    with _open_text(path) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                obj = json.loads(line)
                yield obj if isinstance(obj, dict) else None
            except ValueError:
                yield None


def read_jsonl(
    paths: str | list[str],
    columns: list[str] | None = None,
    strict: bool = True,
    batch_rows: int = 4096,
    types: dict[str, pa.DataType] | None = None,
) -> rd.Dataset:
    plist = [paths] if isinstance(paths, str) else list(paths)
    if strict:
        ds = rd.read_json(plist)
        if columns:
            ds = ds.select_columns(columns)
        return ds

    if not columns:
        raise ValueError(
            "strict=False requires columns=[...]: per-batch column "
            "inference would make block schemas depend on batch boundaries")
    cols = columns
    tmap = dict(types or {})

    def parse(batch: pa.Table):
        for p in batch["path"].to_pylist():
            rows: list[dict] = []
            for obj in _iter_objects(p):
                if obj is None:
                    continue
                rows.append(obj)
                if len(rows) >= batch_rows:
                    yield _table(rows, cols, tmap)
                    rows = []
            if rows:
                yield _table(rows, cols, tmap)

    return rd.from_items([{"path": p} for p in plist]).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def scan_bad_lines(paths: str | list[str]) -> rd.Dataset:
    """Drop-quality report: ``(path, rows, bad_lines)`` per file, one task
    per file — run it on the same drop the tolerant ``read_jsonl`` reads."""
    plist = [paths] if isinstance(paths, str) else list(paths)

    def count(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["path"].to_pylist():
            good = bad = 0
            for obj in _iter_objects(p):
                if obj is None:
                    bad += 1
                else:
                    good += 1
            out.append((p, good, bad))
        return pa.table({
            "path": pa.array([r[0] for r in out], pa.string()),
            "rows": pa.array([r[1] for r in out], pa.int64()),
            "bad_lines": pa.array([r[2] for r in out], pa.int64()),
        })

    return rd.from_items([{"path": p} for p in plist]).map_batches(
        count, batch_format="pyarrow", batch_size=1
    )


def _table(rows: list[dict], cols: list[str],
           types: dict[str, pa.DataType]) -> pa.Table:
    """Batch-INVARIANT schema: string unless declared in ``types``.

    Inferring per batch would flip a column's type on the first junk
    value in that batch while sibling batches stay native — a schema
    mismatch any downstream unification (write_parquet / union / sort)
    would fail on. Declared types coerce per VALUE, junk → null."""
    out: dict[str, pa.Array] = {}
    for c in cols:
        vals = [r.get(c) for r in rows]
        t = types.get(c)
        if t is None:
            out[c] = pa.array(
                [None if v is None else
                 (v if isinstance(v, str) else json.dumps(v)) for v in vals],
                pa.string())
            continue
        try:
            out[c] = pa.array(vals, type=t)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            coerced = []
            for v in vals:
                try:
                    coerced.append(None if v is None
                                   else pa.scalar(v, type=t).as_py())
                except (pa.ArrowInvalid, pa.ArrowTypeError, ValueError,
                        TypeError, OverflowError):
                    coerced.append(None)  # junk value in a typed column
            out[c] = pa.array(coerced, type=t)
    return pa.table(out)
