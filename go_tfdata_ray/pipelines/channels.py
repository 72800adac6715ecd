"""Push-style channel adapters ↔ the reference's ``SampleChannel`` /
``TFExampleChannel`` (/root/reference/tfdata/core/readers.go:55-97): a
buffered read-write endpoint user code pushes records into (``Write``) and
a pipeline drains (``Read`` until EOF), used to wire custom topologies
(/root/reference/test/tfrecord_test.go:27-81 feeds a TFRecord writer from
a channel while a goroutine pushes examples).

Ray-Data-first mapping: a channel is a DRIVER-SIDE staging buffer that
becomes a ``Dataset`` (``to_dataset()``: rows batch into Arrow tables as
you push, so the buffer holds columnar blocks, not Python dicts), and the
reverse direction (``iter_samples``) is a thin wrapper over
``Dataset.iter_batches`` — the streaming executor's backpressure plays the
role of the Go channel's blocking semantics. This is a COMPAT surface for
hand-fed topologies and tests; data of any real size should enter through
the ``read_*``/``from_*`` sources (which scale out reads) instead —
``to_dataset`` warns past a size threshold for that reason.
"""

from __future__ import annotations

import warnings
from typing import Iterator

import pyarrow as pa

import ray.data as rd

# rows per staged Arrow batch: small enough to keep push latency flat,
# large enough that the resulting blocks aren't pathological
_STAGE_ROWS = 4096
# pushes beyond this are a smell that a scalable source should be used
_WARN_ROWS = 1_000_000


class SampleChannel:
    """↔ ``NewSampleChannel``/``Write``/``Close`` (readers.go:77-97).

    ``write`` pushes one sample dict; ``close`` seals the channel;
    ``to_dataset`` yields the staged rows as a Dataset (callable once per
    fill). Iterating the channel drains it row-wise (↔ ``Read`` → EOF).
    """

    def __init__(self, stage_rows: int = _STAGE_ROWS):
        self._stage_rows = stage_rows
        self._pending: list[dict] = []
        self._tables: list[pa.Table] = []
        self._closed = False
        self._n = 0

    def write(self, sample: dict) -> None:
        if self._closed:
            raise ValueError("channel is closed")
        self._pending.append(sample)
        self._n += 1
        if len(self._pending) >= self._stage_rows:
            self._flush()
        if self._n == _WARN_ROWS + 1:
            warnings.warn(
                "SampleChannel staged >1M rows on the driver — use a "
                "read_*/from_* source for data of this size", stacklevel=2)

    def write_many(self, samples) -> None:
        for s in samples:
            self.write(s)

    def _flush(self) -> None:
        if self._pending:
            self._tables.append(pa.Table.from_pylist(self._pending))
            self._pending = []

    def close(self) -> None:
        self._flush()
        self._closed = True

    def __len__(self) -> int:
        return self._n

    def to_dataset(self) -> rd.Dataset:
        """Staged rows → Dataset. Closes the channel (a Go range over a
        channel likewise ends only once the writer closes it)."""
        if not self._closed:
            self.close()
        if not self._tables:
            return rd.from_items([])
        tables = self._tables
        if len({t.schema for t in tables}) > 1:
            # pushed rows may omit keys batch-to-batch (the reference's
            # absent-key permissiveness); unify to the widest schema
            unified = pa.unify_schemas([t.schema for t in tables],
                                       promote_options="permissive")
            tables = [_conform(t, unified) for t in tables]
        return rd.from_arrow(tables)

    def __iter__(self) -> Iterator[dict]:
        """Drain staged rows (↔ ``Read`` until io.EOF)."""
        self._flush()
        for t in self._tables:
            yield from t.to_pylist()


def _conform(t: pa.Table, schema: pa.Schema) -> pa.Table:
    for f in schema:
        if f.name not in t.column_names:
            t = t.append_column(f.name, pa.nulls(len(t), f.type))
    return t.select(schema.names).cast(schema)


class TFExampleChannel(SampleChannel):
    """↔ ``NewTFExampleChannel`` (readers.go:54-73). Identical adapter —
    a TFExample row is a sample dict whose values are already
    feature-typed; the coercion stage (``stages/transforms.coerce_batch``)
    is where Sample→TFExample typing happens, as in the reference's
    Sample2TFExampleStage."""


def iter_samples(ds: rd.Dataset, batch_size: int = _STAGE_ROWS) -> Iterator[dict]:
    """Dataset → row iterator (the consuming end of a channel topology:
    ↔ draining a SampleChannel another pipeline stage writes into).
    Streams batch-by-batch with executor backpressure; never materializes
    the Dataset."""
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        yield from batch.to_pylist()


def channel_from(rows) -> SampleChannel:
    """Convenience: build a sealed channel from any iterable of dicts."""
    ch = SampleChannel()
    ch.write_many(rows)
    ch.close()
    return ch
