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


def test_assign_split_deterministic_fracs():
    df = pd.DataFrame({"doc_id": np.arange(1000, dtype=np.int64)})
    out = rel.assign_split(rd.from_pandas(df), "doc_id").to_pandas()
    counts = out["split"].value_counts()
    assert counts["train"] == 800 and counts["val"] == 100 and counts["test"] == 100
    # stable: same key → same split
    out2 = rel.assign_split(rd.from_pandas(df.sample(frac=1, random_state=0)), "doc_id").to_pandas()
    merged = out.merge(out2, on="doc_id")
    assert (merged["split_x"] == merged["split_y"]).all()


def test_sessionize_gap():
    base = np.datetime64("2026-01-01T00:00:00", "us")
    rows = []
    # user 1: events at 0s, 60s, 4000s (gap>1800 → 2 sessions)
    for i, off in enumerate([0, 60, 4000]):
        rows.append((1, base + np.timedelta64(off, "s"), i))
    # user 2: single event
    rows.append((2, base, 99))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    out = rel.sessionize(
        rd.from_pandas(df), "user_id", "ts", gap_s=1800, order_tiebreak="event_id"
    ).to_pandas()
    got = {(r.user_id, r.session_id): r.n_events for r in out.itertuples()}
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_pack_sequences_roundtrip():
    from go_tfdata_ray.functions import pack
    import pyarrow as pa

    rng = np.random.default_rng(6)
    docs = [list(rng.integers(1, 100, size=rng.integers(1, 50))) for _ in range(40)]
    t = pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(40)], pa.string()),
            "tokens": pa.array(docs, pa.list_(pa.int32())),
        }
    )
    out = pack.pack_batch(t, context_len=64, eod_token=0, pad_token=0)
    seqs = out["tokens"].to_pylist()
    assert all(len(s) == 64 for s in seqs)
    # reconstruct: concatenation of sequences == docs joined by EOD (+ tail pad)
    stream = [x for s in seqs for x in s]
    want = []
    for d in docs:
        want.extend(d)
        want.append(0)
    assert stream[: len(want)] == want
    assert all(x == 0 for x in stream[len(want):])
    assert int(out["n_docs"].to_numpy().sum()) == 40


def test_training_pipeline_composition():
    """The flagship composed pipeline's content-multiset digest is
    internally consistent and matches the lake recomputed directly."""
    from go_tfdata_ray.pipelines import queries as Q

    out = Q.QUERIES["training_pipeline"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["n_docs"] > 0
    # content = every train doc's tokens + exactly one EOD per doc
    eng = Q.replayed_engine("/root/testdata/sf0.001")
    lake = eng.scan_table(columns=["doc_id", "tokens", "n_tok"]).to_pandas()
    num = lake["doc_id"].str.slice(4).astype(int)
    train = lake[(lake["n_tok"] >= 8) & (num % 10 < 8)]
    assert row["n_docs"] == len(train)
    assert row["content_tokens"] == int(train["n_tok"].sum()) + len(train)
    flat = np.concatenate(train["tokens"].to_list()).astype(np.int64)
    assert row["tok_sum"] == int(flat.sum()) + len(train) * 50256
    assert row["tok_sq"] == int((flat * flat).sum()) + len(train) * 50256 * 50256


def test_rolling_per_key_matches_pandas():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 25, 3000),
            "o": rng.permutation(3000).astype(np.int64),
            "v": rng.integers(-50, 100, 3000),
        }
    )
    out = rel.rolling_per_key(
        rd.from_pandas(df), "k", ["o"], "v", out_col="run", num_shards=7
    ).to_pandas()
    want = df.sort_values(["k", "o"]).assign(
        run=lambda d: d.groupby("k")["v"].cumsum()
    )
    got = out.sort_values(["k", "o"]).reset_index(drop=True)
    assert (got["run"].to_numpy() == want["run"].to_numpy()).all()
    assert len(got) == 3000


def test_quantiles_per_group_duckdb_semantics():
    """quantile_disc rule: 0-based index ceil(q*n)-1 of sorted values."""
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"g": rng.integers(0, 6, 500), "v": rng.uniform(0, 1000, 500)}
    )
    out = rel.quantiles_per_group(
        rd.from_pandas(df), "g", "v", {"p0": 0.0, "p50": 0.5, "p90": 0.9},
        num_shards=4,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    for g, grp in df.groupby("g"):
        vs = np.sort(grp["v"].to_numpy())
        n = len(vs)
        row = out[out["g"] == g].iloc[0]
        assert row["p0"] == vs[0]  # q=0 clamps to the group MIN, no wrap
        assert row["p50"] == vs[int(np.ceil(0.5 * n)) - 1]
        assert row["p90"] == vs[int(np.ceil(0.9 * n)) - 1]


def test_topk_global_matches_sort_limit():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({"v": rng.integers(0, 10_000, 5000),
                       "id": np.arange(5000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(8)
    got = rel.topk_global(ds, "v", k=10, descending=True, tie_col="id").to_pandas()
    want = df.sort_values(["v", "id"], ascending=[False, True]).head(10)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))
    asc = rel.topk_global(ds, "v", k=3, descending=False).to_pandas()
    assert list(asc["v"]) == sorted(df["v"])[:3]
