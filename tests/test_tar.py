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
