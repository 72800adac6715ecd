import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from go_tfdata_ray.stages import joins


def sides(n=1000):
    left = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64) % 100),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    right = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "name": [f"n{i}" for i in range(100)]})
    return rd.from_arrow(left), right


def test_broadcast_join_inner():
    big, small = sides()
    out = joins.broadcast_join(big, small, on="k").to_pandas()
    assert len(out) == 1000
    assert (out["name"] == "n" + out["k"].astype(str)).all()


def test_broadcast_join_left_missing_keys():
    big, small = sides()
    out = joins.broadcast_join(big, small[small["k"] < 50], on="k", how="left").to_pandas()
    assert len(out) == 1000
    assert out["name"].isna().sum() == 500


def test_semi_and_anti_join():
    big, _ = sides()
    semi = joins.semi_join_filter(big, keys=range(10), on="k").to_pandas()
    anti = joins.semi_join_filter(big, keys=range(10), on="k", anti=True).to_pandas()
    assert len(semi) == 100 and len(anti) == 900
    assert set(semi["k"]) == set(range(10))


def test_bucket_hash_join_matches_pandas():
    big, small = sides()
    right_ds = rd.from_pandas(small)
    out = joins.bucket_hash_join(big, right_ds, on="k", num_buckets=8).to_pandas()
    expect = big.to_pandas().merge(small, on="k")
    assert len(out) == len(expect)
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = expect.sort_values(["k", "v"]).reset_index(drop=True)
    assert (a[["k", "v", "name"]] == b[["k", "v", "name"]]).all().all()


def test_bucket_join_rejects_indistinguishable_suffixes():
    big, small = sides()
    import pytest

    with pytest.raises(ValueError, match="suffixes"):
        joins.bucket_hash_join(big, big, on="k", suffixes=("", ""))


def test_storage_hash_join_matches_pandas(tmp_path):
    big, small = sides()
    right_ds = rd.from_pandas(small)
    out = joins.storage_hash_join(
        big, right_ds, on="k", num_buckets=8, spill_root=str(tmp_path)
    ).to_pandas()
    expect = big.to_pandas().merge(small, on="k")
    assert len(out) == len(expect)
    a = out.sort_values(["k", "v"]).reset_index(drop=True)
    b = expect.sort_values(["k", "v"]).reset_index(drop=True)
    assert (a[["k", "v", "name"]] == b[["k", "v", "name"]]).all().all()
    # spill GC: the drained join's run dirs sweep clean
    import os
    assert os.listdir(tmp_path)  # the run dir exists while consumable
    assert joins.cleanup_join_spill() >= 1
    assert not os.listdir(tmp_path)  # nothing orphaned


def test_storage_hash_join_left(tmp_path):
    big, small = sides()
    half = small[small["k"] < 5]
    out = joins.storage_hash_join(
        big, rd.from_pandas(half), on="k", how="left", spill_root=str(tmp_path)
    ).to_pandas()
    expect = big.to_pandas().merge(half, on="k", how="left")
    assert len(out) == len(expect)
    assert out["name"].isna().sum() == expect["name"].isna().sum()


def test_asof_join_backward_strict():
    import numpy as np
    import pandas as pd

    base = np.datetime64("2026-01-01T00:00:00", "us")
    t = lambda s: base + np.timedelta64(s, "s")  # noqa: E731
    left = pd.DataFrame(
        {"id": [1, 2, 3, 4], "u": [7, 7, 7, 8],
         "ts": [t(10), t(20), t(30), t(10)]}
    )
    right = pd.DataFrame(
        {"pid": [100, 101, 102], "u": [7, 7, 9], "ts": [t(5), t(20), t(1)]}
    )
    out = joins.asof_join(
        rd.from_pandas(left), rd.from_pandas(right), by="u", on="ts",
        allow_exact_matches=False, num_buckets=4,
    ).to_pandas().sort_values("id")
    got = dict(zip(out["id"], out["pid"].fillna(-1).astype(int)))
    # id1@10: prior purchase 100@5; id2@20: strict < so still 100;
    # id3@30: 101@20; id4 (u=8): none
    assert got == {1: 100, 2: 100, 3: 101, 4: -1}


def test_bucket_hash_join_salted_hot_keys():
    """Skewed probe side: 90% of rows share one key. Salted sub-buckets
    must produce the identical join result (each probe row meets the
    replicated build rows exactly once)."""
    import numpy as np
    import pandas as pd

    import ray.data as rd

    from go_tfdata_ray.stages import joins

    rng = np.random.default_rng(17)
    n = 20_000
    keys = np.where(rng.random(n) < 0.9, 7, rng.integers(0, 50, size=n))
    left = pd.DataFrame({"k": keys, "v": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                          "w": np.arange(50, dtype=np.int64) * 10})
    expect = left.merge(right, on="k", how="inner")

    plain = joins.bucket_hash_join(
        rd.from_pandas(left).repartition(8), rd.from_pandas(right),
        on="k", num_buckets=8,
    ).to_pandas()
    salted = joins.bucket_hash_join(
        rd.from_pandas(left).repartition(8), rd.from_pandas(right),
        on="k", num_buckets=8, hot_keys=[7], salt=4,
    ).to_pandas()
    for got in (plain, salted):
        a = got.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v", "w"]]
        b = expect.sort_values(["k", "v"]).reset_index(drop=True)[["k", "v", "w"]]
        pd.testing.assert_frame_equal(
            a.astype("int64"), b.astype("int64"), check_dtype=False
        )
    # and the hot bucket genuinely split: salted path produced > 1 group
    # for key 7 — indirectly verified by identical results above plus the
    # sub-bucket ids exceeding the normal range in the tag stage


def test_asof_join_right_dedup_inside_bucket():
    import pandas as pd

    import ray.data as rd

    from go_tfdata_ray.stages import joins

    left = pd.DataFrame({"u": [1, 1, 2], "ts": [10, 20, 10],
                         "lv": [100, 200, 300]})
    # duplicate (u, ts) on the right: max 'rv' must win the tie-break
    right = pd.DataFrame({"u": [1, 1, 1, 2], "ts": [5, 5, 15, 5],
                          "rv": [1, 9, 4, 7]})
    out = joins.asof_join(
        rd.from_pandas(left), rd.from_pandas(right), by="u", on="ts",
        right_dedup_max="rv",
    ).to_pandas().sort_values(["u", "ts"]).reset_index(drop=True)
    assert list(out["rv"]) == [9, 4, 7]  # non-clashing right col keeps its name


def _range_fixture(n_pts=2000, n_iv=300, seed=7):
    rng = np.random.default_rng(seed)
    pts = pa.table(
        {
            "pid": pa.array(np.arange(n_pts, dtype=np.int64)),
            "key": pa.array(rng.integers(0, 40, n_pts)),
            "x": pa.array(rng.uniform(0, 1000, n_pts)),
        }
    )
    lo = rng.uniform(0, 950, n_iv)
    iv = pa.table(
        {
            "iid": pa.array(np.arange(n_iv, dtype=np.int64)),
            "key": pa.array(rng.integers(0, 40, n_iv)),
            "lo": pa.array(lo),
            "hi": pa.array(lo + rng.uniform(0, 80, n_iv)),
        }
    )
    return pts, iv


def _brute_pairs(pts, iv, by=None):
    l, r = pts.to_pandas(), iv.to_pandas()
    m = l.merge(r, on=by) if by else l.merge(r, how="cross")
    m = m[(m["x"] >= m["lo"]) & (m["x"] <= m["hi"])]
    return set(zip(m["pid"], m["iid"]))


def test_range_join_by_key():
    pts, iv = _range_fixture()
    out = joins.range_join(
        rd.from_arrow(pts), rd.from_arrow(iv.rename_columns(["iid", "key", "lo", "hi"])),
        on="x", lo="lo", hi="hi", by="key", num_buckets=8,
    ).to_pandas()
    assert set(zip(out["pid"], out["iid"])) == _brute_pairs(pts, iv, by="key")


def test_range_join_binned_no_key():
    pts, iv = _range_fixture()
    out = joins.range_join(
        rd.from_arrow(pts.drop_columns(["key"])), rd.from_arrow(iv.drop_columns(["key"])),
        on="x", lo="lo", hi="hi", bin_width=50.0, num_buckets=8,
    ).to_pandas()
    assert set(zip(out["pid"], out["iid"])) == _brute_pairs(pts, iv)


def test_range_join_timestamp_bins():
    """Timestamp domains bin by unit-safe SECONDS."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pts = pa.table(
        {
            "pid": pa.array(np.arange(500, dtype=np.int64)),
            "ts": pa.array(base + np.arange(500).astype("timedelta64[s]").astype("timedelta64[us]") * 37),
        }
    )
    lo = base + np.arange(40).astype("timedelta64[s]").astype("timedelta64[us]") * 450
    iv = pa.table(
        {
            "iid": pa.array(np.arange(40, dtype=np.int64)),
            "lo": pa.array(lo),
            "hi": pa.array(lo + np.timedelta64(120_000_000, "us")),
        }
    )
    out = joins.range_join(
        rd.from_arrow(pts), rd.from_arrow(iv),
        on="ts", lo="lo", hi="hi", bin_width=60.0, num_buckets=8,
    ).to_pandas()
    l, r = pts.to_pandas(), iv.to_pandas()
    m = l.merge(r, how="cross")
    m = m[(m["ts"] >= m["lo"]) & (m["ts"] <= m["hi"])]
    assert set(zip(out["pid"], out["iid"])) == set(zip(m["pid"], m["iid"]))
    assert len(out) > 0


def test_bucket_join_suffixes_on_overlap():
    """Overlapping non-join columns get pandas-style suffixes instead of
    raising; values land in the right suffixed column."""
    l = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64())})
    r = pa.table({"k": pa.array([1, 2, 4], pa.int64()),
                  "v": pa.array([100, 200, 400], pa.int64())})
    out = joins.bucket_hash_join(rd.from_arrow(l), rd.from_arrow(r),
                                 on="k", num_buckets=4).to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r"]
    got = {(row.k, row.v, row.v_r) for row in out.itertuples()}
    assert got == {(1, 10, 100), (2, 20, 200)}


def test_bucket_join_hot_keys_requires_inner():
    l = pa.table({"k": pa.array([1], pa.int64())})
    r = pa.table({"k": pa.array([1], pa.int64()), "w": pa.array([5], pa.int64())})
    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner"):
        joins.bucket_hash_join(rd.from_arrow(l), rd.from_arrow(r), on="k",
                               how="left", hot_keys=[1])


def test_range_join_malformed_interval_matches_nothing():
    """hi < lo behaves like SQL BETWEEN (empty match) in both routings
    instead of crashing the bin replication."""
    pts = pa.table({"pid": pa.array([0, 1], pa.int64()),
                    "x": pa.array([10.0, 20.0])})
    iv = pa.table({"iid": pa.array([0, 1], pa.int64()),
                   "lo": pa.array([30.0, 5.0]),
                   "hi": pa.array([0.0, 25.0])})  # iid 0 malformed
    out = joins.range_join(rd.from_arrow(pts), rd.from_arrow(iv),
                           on="x", lo="lo", hi="hi", bin_width=10.0,
                           num_buckets=4).to_pandas()
    assert set(zip(out["pid"], out["iid"])) == {(0, 1), (1, 1)}


def test_object_exchange_join_matches_pandas():
    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 200, 3000),
                      "v": rng.integers(0, 10**6, 3000)})
    r = pd.DataFrame({"k": np.arange(150, dtype=np.int64),
                      "w": rng.integers(0, 10**6, 150)})
    for how in ("inner", "left", "outer"):
        out = joins.object_exchange_hash_join(
            rd.from_pandas(l).repartition(5), rd.from_pandas(r).repartition(3),
            on="k", num_buckets=8, how=how,
        ).to_pandas()
        want = l.merge(r, on="k", how=how)
        assert len(out) == len(want), how
        key = lambda df: sorted(map(tuple, df.fillna(-1)[["k", "v", "w"]].to_numpy()))
        assert key(out) == key(want), how


def test_object_exchange_join_suffixes():
    l = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())})
    r = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([100, 200], pa.int64())})
    out = joins.object_exchange_hash_join(
        rd.from_arrow(l), rd.from_arrow(r), on="k", num_buckets=4).to_pandas()
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert {(row.k, row.v, row.v_r) for row in out.itertuples()} == {(1, 10, 100), (2, 20, 200)}


def test_object_exchange_range_join_matches_groupby_strategy():
    pts, iv = _range_fixture()
    # by-key routing
    out = joins.object_exchange_range_join(
        rd.from_arrow(pts), rd.from_arrow(iv),
        on="x", lo="lo", hi="hi", by="key", num_buckets=8,
    ).to_pandas()
    assert set(zip(out["pid"], out["iid"])) == _brute_pairs(pts, iv, by="key")
    # binned routing (no shared key) + malformed-interval clip
    iv2 = iv.drop_columns(["key"])
    iv2 = iv2.set_column(iv2.column_names.index("hi"), "hi",
                         pa.array(np.where(np.arange(len(iv2)) % 37 == 0,
                                           -1.0,
                                           iv2["hi"].to_numpy())))
    out2 = joins.object_exchange_range_join(
        rd.from_arrow(pts.drop_columns(["key"])), rd.from_arrow(iv2),
        on="x", lo="lo", hi="hi", bin_width=50.0, num_buckets=8,
    ).to_pandas()
    assert set(zip(out2["pid"], out2["iid"])) == _brute_pairs(
        pts.drop_columns(["key"]).append_column("key", pa.array(np.zeros(len(pts), np.int64))),
        iv2.append_column("key", pa.array(np.zeros(len(iv2), np.int64))), by=None)


def test_object_exchange_range_join_timestamps():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pts = pa.table({
        "pid": pa.array(np.arange(500, dtype=np.int64)),
        "ts": pa.array(base + np.arange(500).astype("timedelta64[s]").astype("timedelta64[us]") * 37),
    })
    lo = base + np.arange(40).astype("timedelta64[s]").astype("timedelta64[us]") * 450
    iv = pa.table({
        "iid": pa.array(np.arange(40, dtype=np.int64)),
        "lo": pa.array(lo),
        "hi": pa.array(lo + np.timedelta64(120_000_000, "us")),
    })
    got = joins.object_exchange_range_join(
        rd.from_arrow(pts), rd.from_arrow(iv),
        on="ts", lo="lo", hi="hi", bin_width=60.0, num_buckets=8).to_pandas()
    ref = joins.range_join(
        rd.from_arrow(pts), rd.from_arrow(iv),
        on="ts", lo="lo", hi="hi", bin_width=60.0, num_buckets=8).to_pandas()
    assert set(zip(got["pid"], got["iid"])) == set(zip(ref["pid"], ref["iid"]))
    assert len(got) > 0


def test_object_exchange_left_join_schema_stable():
    # unmatched left rows make pandas promote int right-columns to
    # float64(NaN); every bucket must still emit the SAME int64-with-nulls
    # schema
    import ray

    l = rd.from_pandas(pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                                     "lv": np.arange(50, dtype=np.int64)})).repartition(3)
    r = rd.from_pandas(pd.DataFrame({"k": np.arange(0, 50, 2, dtype=np.int64),
                                     "rv": np.arange(25, dtype=np.int64)})).repartition(2)
    j = joins.object_exchange_hash_join(l, r, on="k", how="left", num_buckets=8)
    schemas = {str(ray.get(ref).schema) for ref in j.to_arrow_refs()}
    assert len(schemas) == 1
    df = j.to_pandas()
    assert len(df) == 50 and df["rv"].isna().sum() == 25


def test_anti_join_keys_small_and_bloom_paths_agree():
    # corpus with string keys (the curate shape); drop a planted id set
    n = 500
    big = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    }))
    drop = rd.from_arrow(pa.table(
        {"doc_id": pa.array([f"d{i:04d}" for i in range(0, n, 7)])}))
    want = sorted(f"d{i:04d}" for i in range(n) if i % 7 != 0)

    small = joins.anti_join_keys(big, drop, on="doc_id").to_pandas()
    assert sorted(small["doc_id"]) == want

    # force the distributed Bloom path (threshold below the key count)
    bloom = joins.anti_join_keys(big, drop, on="doc_id",
                                 max_broadcast=1).to_pandas()
    assert sorted(bloom["doc_id"]) == want
    assert list(bloom.columns) == ["doc_id", "v"]


def test_anti_join_keys_exact_under_fp_flood():
    # a deliberately tiny Bloom (64 bits for 72 keys) false-positives on
    # nearly every probe — the exact rescue resolve must still yield the
    # exact anti join
    n = 500
    big = rd.from_arrow(pa.table({
        "doc_id": pa.array([f"d{i:04d}" for i in range(n)]),
        "v": pa.array(np.arange(n, dtype=np.int64)),
    }))
    drop = rd.from_arrow(pa.table(
        {"doc_id": pa.array([f"d{i:04d}" for i in range(0, n, 7)])}))
    out = joins.anti_join_keys(big, drop, on="doc_id",
                               max_broadcast=1, n_bits=64).to_pandas()
    assert sorted(out["doc_id"]) == sorted(
        f"d{i:04d}" for i in range(n) if i % 7 != 0)


def test_anti_join_keys_type_tolerant_and_empty():
    # int-keyed big side vs string loser ids (duplicate_keys casts):
    # membership is stringified on both sides
    big = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 10, 11],
                                                pa.int64())}))
    drop = rd.from_arrow(pa.table({"k": pa.array(["2", "10"])}))
    out = joins.anti_join_keys(big, drop, on="k").to_pandas()
    assert sorted(out["k"]) == [1, 3, 11]
    # empty key set: pass-through
    none = joins.anti_join_keys(
        big, rd.from_arrow(pa.table({"k": pa.array([], pa.string())})),
        on="k").to_pandas()
    assert sorted(none["k"]) == [1, 2, 3, 10, 11]
