"""Push-style channel adapters (pipelines/channels.py) ↔ the reference's
SampleChannel/TFExampleChannel custom-topology surface."""

import numpy as np
import pytest

from go_tfdata_ray.pipelines import channels as ch
from go_tfdata_ray.pipelines.builder import DefaultPipeline


def test_channel_push_to_dataset():
    c = ch.SampleChannel(stage_rows=16)
    c.write_many({"k": i, "v": f"s{i}"} for i in range(100))
    ds = c.to_dataset()
    df = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(df) == 100 and list(df["k"]) == list(range(100))
    assert len(c) == 100


def test_channel_write_after_close_raises():
    c = ch.SampleChannel()
    c.write({"a": 1})
    c.close()
    with pytest.raises(ValueError, match="closed"):
        c.write({"a": 2})


def test_channel_absent_key_permissive_schema():
    # rows may omit keys batch-to-batch (reference sample.go:10 semantics)
    c = ch.SampleChannel(stage_rows=2)
    c.write_many([{"a": 1, "b": "x"}, {"a": 2, "b": "y"},
                  {"a": 3}, {"a": 4}])
    df = c.to_dataset().to_pandas().sort_values("a").reset_index(drop=True)
    assert list(df["a"]) == [1, 2, 3, 4]
    assert df["b"].isna().sum() == 2


def test_channel_drain_iterator():
    c = ch.channel_from({"i": i} for i in range(10))
    assert [r["i"] for r in c] == list(range(10))


def test_iter_samples_streams_dataset():
    import ray.data as rd

    ds = rd.range(50).map_batches(
        lambda t: t.rename_columns(["n"]), batch_format="pyarrow")
    got = sorted(r["n"] for r in ch.iter_samples(ds, batch_size=7))
    assert got == list(range(50))


def test_channel_topology_through_pipeline(tmp_path):
    """The reference's channel→writer topology (tfrecord_test.go:27-81):
    push examples into a channel, drain it through a pipeline into
    TFRecord, read back."""
    c = ch.TFExampleChannel()
    rng = np.random.default_rng(0)
    for i in range(40):
        c.write({"__key__": f"k{i:03d}", "x": int(rng.integers(0, 1000)),
                 "s": f"payload-{i}"})
    out = str(tmp_path / "chan.tfrecord")
    n = DefaultPipeline().from_channel(c).to_tfrecord(out).do()
    assert n == 40
    back = (DefaultPipeline().from_tfrecord(out).collect().do()
            .to_pandas())
    assert len(back) == 40
    keys = sorted(np.asarray(v).ravel()[0].decode() for v in back["__key__"])
    assert keys == [f"k{i:03d}" for i in range(40)]


def test_empty_channel_dataset():
    c = ch.SampleChannel()
    assert c.to_dataset().count() == 0
