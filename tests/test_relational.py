"""Tests for relational operators: deterministic sampling, explode,
group-collect (the tar Record-grouping analog), per-group top-k."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from go_tfdata_ray.stages import relational as rel


def test_sample_mod_deterministic():
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100.0)})
    out = rel.sample_mod(rd.from_pandas(df), "k", 10).to_pandas()
    assert sorted(out["k"]) == list(range(0, 100, 10))
    out2 = rel.sample_mod(rd.from_pandas(df), "k", 10, r=3).to_pandas()
    assert sorted(out2["k"]) == list(range(3, 100, 10))


def test_explode_list():
    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "xs": pa.array([[10, 20], [], [30]], pa.list_(pa.int32())),
        }
    )
    out = rel.explode_list(rd.from_arrow(t), "xs", value_name="x").to_pandas()
    assert list(out["id"]) == [1, 1, 3]
    assert list(out["x"]) == [10, 20, 30]


def test_collect_group_csv():
    df = pd.DataFrame({"g": [1, 2, 1, 1, 2], "v": [30, 5, 10, 20, 1]})
    out = rel.collect_group_csv(rd.from_pandas(df), "g", "v").to_pandas()
    got = dict(zip(out["g"], out["values_csv"]))
    assert got == {1: "10,20,30", 2: "1,5"}


def test_topk_per_group():
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 50),
            "id": np.arange(150, dtype=np.int64),
            "score": rng.standard_normal(150),
        }
    )
    out = rel.topk_per_group(
        rd.from_pandas(df), "g", "score", k=3, descending=True, tie_col="id"
    ).to_pandas()
    for g, sub in df.groupby("g"):
        want = sub.sort_values(["score", "id"], ascending=[False, True]).head(3)
        got = out[out["g"] == g].sort_values(["score", "id"], ascending=[False, True])
        assert list(got["id"]) == list(want["id"])
