"""Tar source tests — mirror the reference's tar_test.go: sample arity,
member presence, key grouping, gz variant, round-trip (test/tar_test.go:17-91)."""

import io
import tarfile

import pytest

import ray.data as rd

from go_tfdata_ray.sources import tar as tarmod


def make_tar(path, n=10, members=("cls", "jpg"), gz=False):
    mode = "w:gz" if gz else "w"
    with tarfile.open(path, mode) as tf:
        for i in range(n):
            for m in members:
                data = f"sample-{i}-{m}".encode() * (i + 1)
                info = tarfile.TarInfo(name=f"dir/sample-{i:03d}.{m}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    return path


def test_tar_long_layout(tmp_path):
    p = make_tar(str(tmp_path / "small-10.tar"))
    ds = tarmod.read_tar_samples(p)
    df = ds.to_pandas()
    assert len(df) == 20  # 10 samples × 2 members
    assert set(df["member"]) == {"cls", "jpg"}
    assert df["__key__"].nunique() == 10
    row = df[(df["__key__"] == "dir/sample-003") & (df["member"] == "cls")].iloc[0]
    assert bytes(row["data"]) == b"sample-3-cls" * 4


def test_tar_records_wide_and_complete(tmp_path):
    p = make_tar(str(tmp_path / "t.tar"))
    # add an incomplete sample (only cls)
    with tarfile.open(p, "a") as tf:
        data = b"lonely"
        info = tarfile.TarInfo(name="dir/incomplete.cls")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    ds = tarmod.read_tar_samples(p)
    wide = tarmod.records(ds, ["cls", "jpg"]).to_pandas()
    assert len(wide) == 10  # incomplete dropped (SameMembers check)
    assert set(wide.columns) == {"__key__", "cls", "jpg"}
    loose = tarmod.records(tarmod.read_tar_samples(p), ["cls", "jpg"],
                           require_complete=False).to_pandas()
    assert len(loose) == 11
    assert loose[loose["__key__"] == "dir/incomplete"]["jpg"].isna().all()


def test_tar_gz_variant(tmp_path):
    p = make_tar(str(tmp_path / "small.tar.gz"), n=21, members=("cls", "img"), gz=True)
    ds = tarmod.read_tar_samples(p)
    assert ds.count() == 42


def test_tar_multiple_archives_parallel(tmp_path):
    paths = [make_tar(str(tmp_path / f"t{i}.tar"), n=5) for i in range(3)]
    ds = tarmod.read_tar_samples(paths)
    df = ds.to_pandas()
    assert len(df) == 30 and df["__key__"].nunique() == 5  # same keys per archive


def test_tar_round_trip(tmp_path):
    p = make_tar(str(tmp_path / "in.tar"))
    wide = tarmod.records(tarmod.read_tar_samples(p), ["cls", "jpg"])
    out = str(tmp_path / "out.tar")
    n = tarmod.write_tar_samples(wide, out, ["cls", "jpg"])
    assert n == 10
    back = tarmod.records(tarmod.read_tar_samples(out), ["cls", "jpg"]).to_pandas()
    assert len(back) == 10


def test_tar_invalid_file(tmp_path):
    bad = tmp_path / "bad.tar"
    bad.write_bytes(b"this is not a tar archive at all")
    with pytest.raises(Exception):
        tarmod.read_tar_samples(str(bad)).count()


def _interleaved_tar(path, n_keys=50, members=("txt", "cls")):
    """Members of each key deliberately NON-adjacent: all .txt first, then
    all .cls — every record completes only in the second half."""
    import io
    import tarfile

    with tarfile.open(path, "w") as tf:
        for m in members:
            for k in range(n_keys):
                payload = f"{m}-{k}".encode() * 3
                info = tarfile.TarInfo(name=f"rec-{k:04d}.{m}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))


def test_stream_tar_matches_greedy(tmp_path, ray_session):
    from go_tfdata_ray.sources import tar as tarmod

    p = str(tmp_path / "x.tar")
    _interleaved_tar(p)
    greedy = tarmod.read_tar_samples(p).to_pandas()
    stream = tarmod.read_tar_samples_streaming(p, batch_rows=16).to_pandas()
    key = ["__key__", "member"]
    g = greedy.sort_values(key).reset_index(drop=True)
    s = stream.sort_values(key).reset_index(drop=True)
    assert g.equals(s)


def test_stream_tar_emits_incrementally_bounded(tmp_path):
    """Adjacent-member tar: records complete immediately, so the pending
    map stays O(1) and batches flow before EOF — the seekreader memory
    contract (seekreader.go:17-21,125-133)."""
    import io
    import tarfile

    from go_tfdata_ray.sources import tar as tarmod

    p = str(tmp_path / "adj.tar")
    with tarfile.open(p, "w") as tf:
        for k in range(200):
            for m in ("a", "b"):
                payload = f"{m}{k}".encode()
                info = tarfile.TarInfo(name=f"r{k:04d}.{m}")
                info.size = len(payload)
                tf.addfile(info, io.BytesIO(payload))
    stats = {}
    batches = list(tarmod.stream_tar_records(p, batch_rows=20, stats=stats))
    assert len(batches) > 5  # incremental emission, not one giant table
    assert stats["max_pending"] == 1  # bounded incomplete map
    total = sum(len(b) for b in batches)
    assert total == 400
    # worst case (interleaved) still correct, pending bounded by n_keys
    p2 = str(tmp_path / "inter.tar")
    _interleaved_tar(p2, n_keys=30)
    stats2 = {}
    rows = sum(len(b) for b in tarmod.stream_tar_records(p2, stats=stats2))
    assert rows == 60
    assert stats2["max_pending"] <= 30


def test_stream_tar_gz(tmp_path, ray_session):
    import gzip
    import shutil

    from go_tfdata_ray.sources import tar as tarmod

    p = str(tmp_path / "y.tar")
    _interleaved_tar(p, n_keys=10)
    gz = p + ".gz"
    with open(p, "rb") as fi, gzip.open(gz, "wb") as fo:
        shutil.copyfileobj(fi, fo)
    out = tarmod.read_tar_samples_streaming(gz).to_pandas()
    assert len(out) == 20
