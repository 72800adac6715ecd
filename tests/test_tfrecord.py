"""TFRecord compat round-trip tests — mirror the reference's round-trip
equality suite (`/root/reference/test/tfrecord_test.go:132-238`) and
error-path tests."""

import io

import pytest

from go_tfdata_ray.sources import tfrecord as tfr


def samples(n=20):
    return [
        {
            "__key__": f"k{i:04d}".encode(),
            "tokens": list(range(i, i + 5)),
            "weights": [i / 2.0, i / 3.0],
            "raw": bytes([i % 256]) * 3,
        }
        for i in range(n)
    ]


def test_crc32c_known_vectors():
    # public CRC32C test vectors (rfc3720 / kernel test suite)
    assert tfr.crc32c(b"") == 0x0
    assert tfr.crc32c(b"123456789") == 0xE3069283
    assert tfr.crc32c(b"\x00" * 32) == 0x8A9136AA


def test_round_trip_equality():
    buf = io.BytesIO()
    w = tfr.TFRecordWriter(buf)
    orig = samples()
    assert w.write_examples(orig) == 20
    buf.seek(0)
    back = tfr.TFRecordReader(buf).read_all_examples()
    assert len(back) == 20
    for a, b in zip(orig, back):
        assert b["__key__"] == [a["__key__"]]  # scalars come back as 1-elem lists
        assert b["tokens"] == a["tokens"]
        assert b["raw"] == [a["raw"]]
        assert b["weights"] == pytest.approx(a["weights"], abs=1e-6)  # float32


def test_negative_int64_and_scalars():
    buf = io.BytesIO()
    tfr.TFRecordWriter(buf).write_examples([{"a": -5, "b": 3.5, "c": b"x"}])
    buf.seek(0)
    (ex,) = tfr.TFRecordReader(buf).read_all_examples()
    assert ex["a"] == [-5]
    assert ex["b"] == [3.5]
    assert ex["c"] == [b"x"]


def test_corrupt_payload_detected():
    buf = io.BytesIO()
    tfr.TFRecordWriter(buf).write_examples(samples(3))
    raw = bytearray(buf.getvalue())
    raw[20] ^= 0xFF  # flip a payload byte
    r = tfr.TFRecordReader(io.BytesIO(bytes(raw)))
    with pytest.raises(tfr.CorruptRecordError):
        r.read_all_examples()


def test_truncated_file_detected():
    buf = io.BytesIO()
    tfr.TFRecordWriter(buf).write_examples(samples(2))
    r = tfr.TFRecordReader(io.BytesIO(buf.getvalue()[:-10]))
    with pytest.raises(tfr.CorruptRecordError):
        r.read_all_examples()


def test_ray_data_can_read_our_tfrecords(tmp_path):
    """Interchange check: ray.data.read_tfrecords parses our framing+proto."""
    path = tmp_path / "out.tfrecord"
    with open(path, "wb") as f:
        tfr.TFRecordWriter(f).write_examples(samples(10))
    import ray.data as rd

    try:
        ds = rd.read_tfrecords(str(path))
        rows = ds.take_all()
    except (ImportError, ModuleNotFoundError) as e:  # needs no TF in ray>=2.x
        pytest.skip(f"ray read_tfrecords unavailable: {e}")
    assert len(rows) == 10
    got = sorted(r["tokens"] if isinstance(r["tokens"], list) else list(r["tokens"]) for r in rows)
    assert got[0] == [0, 1, 2, 3, 4]


def test_pipeline_tfrecord_source_and_sink(tmp_path):
    """tar→transform→TFRecord pipeline analog E2E (pipeline_test.go:16-55):
    write a tfrecord, read through the builder, transform, sink, re-read."""
    import ray.data as rd
    from go_tfdata_ray.pipelines.builder import DefaultPipeline
    from go_tfdata_ray.stages.transforms import ByKey

    src = tmp_path / "in.tfrecord"
    with open(src, "wb") as f:
        tfr.TFRecordWriter(f).write_examples(samples(15))

    out = tmp_path / "out.tfrecord"
    n = (
        DefaultPipeline()
        .from_tfrecord(str(src))
        .to_tfrecord(str(out))
        .do()
    )
    assert n == 15
    with open(out, "rb") as f:
        back = tfr.TFRecordReader(f).read_all_examples()
    assert len(back) == 15
    toks = sorted(tuple(b["tokens"]) for b in back)
    assert toks[0] == (0, 1, 2, 3, 4)


def test_crc32c_many_matches_scalar():
    import numpy as np

    from go_tfdata_ray.sources.tfrecord import crc32c, crc32c_many, masked_crc, masked_crc_many

    rng = np.random.default_rng(9)
    chunks = [bytes(rng.integers(0, 256, size=int(n), dtype=np.uint8))
              for n in rng.integers(0, 400, size=50)] + [b""]
    many = crc32c_many(chunks)
    for c, m in zip(chunks, many):
        assert crc32c(c) == int(m)
    masked = masked_crc_many(chunks)
    for c, m in zip(chunks, masked):
        assert masked_crc(c) == int(m)


def test_crc32c_known_vector():
    from go_tfdata_ray.sources.tfrecord import crc32c, crc32c_many

    # RFC 3720 test vector: 32 zero bytes → 0x8A9136AA
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert int(crc32c_many([b"\x00" * 32])[0]) == 0x8A9136AA


def test_parallel_tfrecord_dir_roundtrip(tmp_path):
    import pandas as pd

    import ray.data as rd

    from go_tfdata_ray.pipelines.builder import DefaultPipeline

    df = pd.DataFrame({"doc_id": range(1000), "val": [i * 3 for i in range(1000)]})
    src = rd.from_pandas(df).repartition(8)  # several parallel shard writers
    out = str(tmp_path / "shards")
    n = DefaultPipeline().from_dataset(src).to_tfrecord_dir(out).do()
    assert n == 1000
    import os

    parts = [p for p in os.listdir(out) if p.endswith(".tfrecord")]
    assert len(parts) > 1  # genuinely sharded
    back = DefaultPipeline().from_tfrecord(out).collect().do().to_pandas()
    # int64 scalars round-trip as single-element lists (reference semantics)
    got = sorted((int(r[0]), int(v[0])) for r, v in zip(back["doc_id"], back["val"]))
    assert got == [(i, i * 3) for i in range(1000)]

    # retry idempotency: shard names derive from content, so re-running the
    # same write (= a retried task after its rename) adds NO duplicate shards
    n2 = DefaultPipeline().from_dataset(src).to_tfrecord_dir(out).do()
    assert n2 == 1000
    parts2 = sorted(p for p in os.listdir(out) if p.endswith(".tfrecord"))
    assert parts2 == sorted(parts)


def test_tfrecord_dir_duplicate_blocks_keep_all_rows(tmp_path):
    """Byte-identical blocks (id-less exports over duplicated corpora)
    content-address to one shard name; the sink must disambiguate TRUE
    duplicates with deterministic -dupN copies so the export keeps every
    row, while a retried task (one intent row) never inflates the count."""
    import os

    import pandas as pd
    import ray.data as rd

    from go_tfdata_ray.pipelines.builder import DefaultPipeline

    block = pd.DataFrame({"val": [7, 8, 9]})
    # two byte-identical single-block datasets unioned → identical encodings
    src = rd.from_pandas(block).union(rd.from_pandas(block))
    out = str(tmp_path / "dup_shards")
    n = DefaultPipeline().from_dataset(src).to_tfrecord_dir(out).do()
    assert n == 6
    parts = sorted(p for p in os.listdir(out) if p.endswith(".tfrecord"))
    assert len(parts) == 2 and any("-dup1" in p for p in parts)
    back = DefaultPipeline().from_tfrecord(out).collect().do().to_pandas()
    assert sorted(int(v[0]) for v in back["val"]) == [7, 7, 8, 8, 9, 9]
    # deterministic: re-export reproduces the same layout and count
    n2 = DefaultPipeline().from_dataset(src).to_tfrecord_dir(out).do()
    assert n2 == 6
    assert sorted(p for p in os.listdir(out) if p.endswith(".tfrecord")) == parts

    # duplicate-heavy export (>4 dup jobs) crosses to the task-fan-out copy
    # path — same layout rules, no driver-serial byte loop
    src8 = rd.from_pandas(block)
    for _ in range(7):
        src8 = src8.union(rd.from_pandas(block))
    out8 = str(tmp_path / "dup_shards_8")
    n8 = DefaultPipeline().from_dataset(src8).to_tfrecord_dir(out8).do()
    assert n8 == 24
    parts8 = sorted(p for p in os.listdir(out8) if p.endswith(".tfrecord"))
    assert len(parts8) == 8
    assert sorted(p for p in parts8 if "-dup" in p) == sorted(
        p for p in parts8 if any(f"-dup{k}." in p for k in range(1, 8)))
    assert len([p for p in parts8 if "-dup" in p]) == 7
    back8 = DefaultPipeline().from_tfrecord(out8).collect().do().to_pandas()
    assert sorted(int(v[0]) for v in back8["val"]) == sorted([7, 8, 9] * 8)
    assert not any(".tmp-" in p for p in os.listdir(out8))  # no litter


def test_tfrecord_sink_throughput(tmp_path):
    """The vectorized-CRC sink must beat the scalar-loop regime (~1 MB/s)
    by a wide margin even single-threaded — soft bound to dodge CI noise."""
    import time

    import numpy as np

    from go_tfdata_ray.sources.tfrecord import TFRecordReader, TFRecordWriter

    rng = np.random.default_rng(4)
    payloads = [bytes(rng.integers(0, 256, size=1024, dtype=np.uint8)) for _ in range(20_000)]
    path = tmp_path / "big.tfrecord"
    dt_w = float("inf")  # best-of-3: this box's load noise is multi-×
    for _ in range(3):
        t0 = time.perf_counter()
        with open(path, "wb") as f:
            TFRecordWriter(f).write_many(payloads)
        dt_w = min(dt_w, time.perf_counter() - t0)
    mb = 20_000 * 1024 / 1e6
    # 10 MB/s = 10× the scalar-CRC regime this guards against, with
    # headroom for full-suite load noise (measured >40 MB/s idle)
    assert mb / dt_w > 10, f"write {mb/dt_w:.1f} MB/s"
    t0 = time.perf_counter()
    with open(path, "rb") as f:
        got = TFRecordReader(f).read_all_payloads()
    dt_r = time.perf_counter() - t0
    assert got == payloads
    assert mb / dt_r > 20, f"read {mb/dt_r:.1f} MB/s"


def test_tfrecord_gzip_roundtrip(tmp_path):
    # transparent gzip: single-file writer gz-wraps on .gz suffix, readers
    # sniff the magic (the reference composes io.Readers for the same)
    import gzip

    import pandas as pd

    import ray.data as rd

    from go_tfdata_ray.pipelines.builder import DefaultPipeline
    from go_tfdata_ray.sources.tfrecord import TFRecordReader, open_tfrecord

    df = pd.DataFrame({"doc_id": range(200), "val": [i * 7 for i in range(200)]})
    src = rd.from_pandas(df)
    path = str(tmp_path / "data.tfrecord.gz")
    n = DefaultPipeline().from_dataset(src).to_tfrecord(path).do()
    assert n == 200
    with open(path, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"  # actually gzip on disk
    with open_tfrecord(path) as f:
        assert len(TFRecordReader(f).read_all_payloads()) == 200
    back = DefaultPipeline().from_tfrecord(path).collect().do().to_pandas()
    got = sorted((int(r[0]), int(v[0])) for r, v in zip(back["doc_id"], back["val"]))
    assert got == [(i, i * 7) for i in range(200)]


def test_tfrecord_dir_gzip_shards_and_mixed_read(tmp_path):
    import os

    import pandas as pd

    import ray.data as rd

    from go_tfdata_ray.pipelines.builder import DefaultPipeline

    df = pd.DataFrame({"doc_id": range(400), "val": [i + 1 for i in range(400)]})
    out = str(tmp_path / "shards")
    n = (DefaultPipeline().from_dataset(rd.from_pandas(df).repartition(4))
         .to_tfrecord_dir(out, compression="gz").do())
    assert n == 400
    parts = os.listdir(out)
    assert parts and all(p.endswith(".tfrecord.gz") for p in parts)
    # add an UNCOMPRESSED shard to the same dir: the reader handles both
    df2 = pd.DataFrame({"doc_id": range(400, 500), "val": [i + 1 for i in range(400, 500)]})
    (DefaultPipeline().from_dataset(rd.from_pandas(df2))
     .to_tfrecord_dir(out).do())
    back = DefaultPipeline().from_tfrecord(out).collect().do().to_pandas()
    got = sorted((int(r[0]), int(v[0])) for r, v in zip(back["doc_id"], back["val"]))
    assert got == [(i, i + 1) for i in range(500)]
