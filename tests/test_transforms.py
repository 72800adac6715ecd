"""Operator unit tests with synthetic sources — mirrors the reference's
transform/selection/filter tests (test/transform_test.go, test/filter_test.go)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from go_tfdata_ray.stages import transforms as tr
from go_tfdata_ray.stages.transforms import (
    ByBatchF,
    ByKey,
    ByKeyValue,
    ByPrefix,
    BySubstring,
    BySuffix,
)
from go_tfdata_ray.pipelines.builder import DefaultPipeline


def synth(n=100):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"k{i:04d}" for i in range(n)]),
                "jpeg": pa.array([f"img{i}".encode() for i in range(n)], pa.binary()),
                "cls": pa.array([i % 5 for i in range(n)], pa.int64()),
                "score": pa.array([i / 10 for i in range(n)], pa.float64()),
            }
        )
    )


def test_rename_last_src_wins_and_srcs_kept():
    # transformation.go:63-70: iterate srcs in order, overwrite dest; keep srcs
    t = pa.table({"a": [1], "b": [2]})
    out = tr.rename_batch(t, "dest", ["a", "b", "missing"])
    assert out.column_names == ["a", "b", "dest"]
    assert out["dest"][0].as_py() == 2


def test_rename_dataset():
    out = tr.rename(synth(10), "img", ["jpeg"]).take_all()
    assert all(r["img"] == r["jpeg"] for r in out)


def test_select_static_union():
    # projection keeps the UNION of selections (transformation.go:95-103)
    out = tr.select(synth(10), ByKey("doc_id"), ByPrefix("cl"), BySuffix("ore")).take_all()
    assert set(out[0].keys()) == {"doc_id", "cls", "score"}


def test_select_substring():
    out = tr.select(synth(5), BySubstring("pe")).take_all()  # jpeg
    assert set(out[0].keys()) == {"jpeg"}


def test_keyvalue_plus_filter_empty_is_row_predicate():
    # test/filter_test.go:29-46: exactly the matching rows survive
    n = 5000
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([f"k{i}" for i in range(n)]),
                "cls": pa.array([i % 1000 for i in range(n)], pa.int64()),
            }
        )
    )
    picked = tr.select(ds, ByKey("doc_id"), ByKeyValue("cls", 7))
    out = tr.filter_empty(picked, key_col="doc_id").take_all()
    assert len(out) == 5  # 5000 rows, cls==7 hits 5
    assert all(r["cls"] == 7 for r in out)


def test_by_batchf_masks():
    def even_cls(t):
        m = np.asarray(t["cls"].to_numpy(zero_copy_only=False) % 2 == 0)
        return {"cls": m}

    out = tr.filter_empty(
        tr.select(synth(10), ByKey("doc_id"), ByBatchF(even_cls)), key_col="doc_id"
    ).take_all()
    assert len(out) == 6  # cls in {0,1,2,3,4} repeating; even for i%5 in {0,2,4}


def test_filter_empty_all_null_rows():
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "x": pa.array([1, None, None], pa.int64()),
            "y": pa.array([None, 2, None], pa.int64()),
        }
    )
    out = tr.filter_empty_batch(t)
    assert out["doc_id"].to_pylist() == ["a", "b"]


def test_coerce_declared_and_fallback():
    # transformer.go:120-204: declared cast; undeclared -> JSON bytes
    t = pa.table(
        {
            "n": pa.array([1, 2], pa.int32()),
            "raw": pa.array([b"x", b"y"], pa.binary()),
            "extra": pa.array([{"a": 1}, None], pa.struct([("a", pa.int64())])),
        }
    )
    out = tr.coerce_batch(t, {"n": pa.int64()})
    assert out["n"].type == pa.int64()
    assert out["raw"].type == pa.binary()  # []byte passthrough
    assert out["extra"].to_pylist() == [b'{"a": 1}', None]  # JSON fallback


def test_coerce_fallback_primitives_vectorized_json():
    """Undeclared primitive columns fall back through the vectorized
    cast→string path; every emitted cell must still parse as JSON to the
    identical value."""
    import json

    t = pa.table(
        {
            "i": pa.array([0, -7, 2**40, None], pa.int64()),
            "f": pa.array([1.5, 1e20, 1 / 3, None], pa.float64()),
            "b": pa.array([True, False, True, None], pa.bool_()),
            "s": pa.array(['he said "hi"', "", None, "x"], pa.string()),
        }
    )
    out = tr.coerce_batch(t, {})
    for col, vals in [("i", [0, -7, 2**40, None]),
                      ("f", [1.5, 1e20, 1 / 3, None]),
                      ("b", [True, False, True, None]),
                      ("s", ['he said "hi"', "", None, "x"])]:
        assert out[col].type == pa.binary()
        got = [None if c is None else json.loads(c) for c in out[col].to_pylist()]
        assert got == vals, col


def test_pipeline_builder_stage_semantics(tmp_path):
    # optional stages compose; required override (pipeline.go:131-175)
    p = (
        DefaultPipeline()
        .from_dataset(synth(20))
        .rename("img", ["jpeg"])
        .select(ByKey("doc_id"), ByKey("img"), ByKey("cls"))
        .to_parquet(str(tmp_path / "out"))
    )
    p.do()
    back = rd.read_parquet(str(tmp_path / "out"))
    assert back.count() == 20
    assert set(back.schema().names) == {"doc_id", "img", "cls"}


def test_pipeline_requires_source_and_sink():
    with pytest.raises(ValueError):
        DefaultPipeline().collect().do()
    with pytest.raises(ValueError):
        DefaultPipeline().from_dataset(synth(1)).do()


def test_coerce_json_fallback_nonfinite_floats():
    # arrow renders nan/inf as 'nan'/'inf' which json.loads rejects; the
    # vectorized fallback must emit json.dumps-compatible spellings
    import json

    from go_tfdata_ray.stages.transforms import coerce_batch

    t = pa.table({"f": pa.array([1.5, float("nan"), float("inf"),
                                 float("-inf"), None])})
    out = [None if v is None else json.loads(v)
           for v in coerce_batch(t, {})["f"].to_pylist()]
    assert out[0] == 1.5 and out[1] != out[1]  # NaN
    assert out[2] == float("inf") and out[3] == float("-inf") and out[4] is None
