"""From-spec AVI (RIFF) container tests — writer round-trip, both idx1
offset conventions, the index-less movi-walk fallback, truncation, and
the FrameSampler integration."""

import struct

import numpy as np
import pytest

import ray.data as rd

from go_tfdata_ray.functions import avi, codecs, multimodal
from go_tfdata_ray.functions.multimodal import synth_gif_frames


def _mk_avi(n_frames=5, seed=7, fps=10):
    frames_px = synth_gif_frames(seed, n_frames)
    jpegs = [codecs.encode_jpeg(np.asarray(f)) for f in frames_px]
    return avi.encode_avi_mjpeg(jpegs, fps=fps, width=16, height=16), jpegs


def test_avi_roundtrip_headers_and_frames():
    buf, jpegs = _mk_avi(5)
    assert avi.is_avi(buf)
    info = avi.avi_info(buf)
    assert info["n_frames"] == 5 and info["n_streams"] == 1
    assert info["width"] == 16 and info["height"] == 16
    assert info["handler"] == "MJPG" and info["fps"] == 10.0
    assert avi.count_avi_frames(buf) == 5
    # frame payloads come back byte-identical, in order
    assert avi.split_avi_frames(buf) == jpegs
    # a sampled frame pixel-decodes to the same image as its source JPEG
    got = codecs.decode_jpeg(avi.extract_avi_frames(buf, [3])[0])
    assert (got == codecs.decode_jpeg(jpegs[3])).all()
    # sniffing dispatch: AVI decodes its FIRST frame like GIF does
    assert codecs.sniff_image_format(buf) == "avi"
    assert (codecs.decode_image(buf) == codecs.decode_jpeg(jpegs[0])).all()


def test_avi_index_and_walk_paths_agree():
    buf, _ = _mk_avi(7)
    idx = avi._index_frames(buf, 0)
    walk = avi._walk_frames(buf, 0)
    assert idx is not None and idx == walk


def _strip_idx1(buf: bytes) -> bytes:
    """Rebuild the AVI without its idx1 chunk (index-less files exist in
    the wild; the movi walk must carry them)."""
    end = 8 + struct.unpack_from("<I", buf, 4)[0]
    body = b"AVI "
    for fcc, b, s in avi._iter_chunks(buf, 12, end):
        if fcc == b"idx1":
            continue
        body += buf[b - 8:b + s + (s & 1)]
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_without_idx1_falls_back_to_movi_walk():
    buf, jpegs = _mk_avi(6)
    stripped = _strip_idx1(buf)
    assert avi._index_frames(stripped, 0) is None
    assert avi.count_avi_frames(stripped) == 6
    assert avi.split_avi_frames(stripped) == jpegs


def test_avi_absolute_offset_idx1_convention():
    # some writers store ABSOLUTE file offsets in idx1; the reader
    # disambiguates by checking which base lands on the chunk id
    buf, jpegs = _mk_avi(4)
    end = 8 + struct.unpack_from("<I", buf, 4)[0]
    movi_start = avi._movi_bounds(buf)[0]
    out = bytearray(buf)
    for fcc, b, s in avi._iter_chunks(buf, 12, end):
        if fcc == b"idx1":
            for off in range(b, b + (s // 16) * 16, 16):
                rel = struct.unpack_from("<I", buf, off + 8)[0]
                struct.pack_into("<I", out, off + 8, movi_start + rel)
    assert avi.split_avi_frames(bytes(out)) == jpegs


def test_avi_truncated_raises():
    buf, _ = _mk_avi(3)
    with pytest.raises(ValueError):
        avi.split_avi_frames(buf[: len(buf) // 2])
    assert not avi.is_avi(b"RIFF\x04\x00\x00\x00WAVE")  # WAV is RIFF too
    with pytest.raises(ValueError):
        avi.avi_info(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_sampler_real_avi_leg():
    t = multimodal.synth_media_table(12, media_type="video", payload="avi")
    out = multimodal.sample_frames(
        rd.from_arrow(t), every_n=10, mode="real").to_pandas()
    # closed form: n_frames=(i%30)+1, sampled every 10
    want = sum(len(range(0, (i % 30) + 1, 10)) for i in range(12))
    assert len(out) == want
    got = out.groupby("media_id")["frame_idx"].max().to_dict()
    for i in range(12):
        nf = (i % 30) + 1
        assert got[f"m-{i:06d}"] == ((nf - 1) // 10) * 10
