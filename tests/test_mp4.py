"""From-spec MP4 (ISO-BMFF) container tests — writer round-trip across
chunking/layout/width variants, stsc run expansion, 64-bit (v1 + co64 +
largesize) parsing, truncation, and the FrameSampler integration."""

import struct

import numpy as np
import pytest

import ray.data as rd

from go_tfdata_ray.functions import codecs, mp4, multimodal
from go_tfdata_ray.functions.multimodal import synth_gif_frames


def _mk_mp4(n_frames=5, seed=7, **kw):
    frames_px = synth_gif_frames(seed, n_frames)
    jpegs = [codecs.encode_jpeg(np.asarray(f)) for f in frames_px]
    return mp4.encode_mp4_mjpeg(jpegs, fps=10, width=16, height=16, **kw), jpegs


def test_mp4_roundtrip_headers_and_frames():
    buf, jpegs = _mk_mp4(5)
    assert mp4.is_mp4(buf)
    info = mp4.mp4_info(buf)
    assert info["n_frames"] == 5 and info["fps"] == 10.0
    assert info["width"] == 16.0 and info["height"] == 16.0
    assert info["codec"] == "jpeg" and info["timescale"] == 1000
    assert mp4.count_mp4_frames(buf) == 5
    # sample payloads come back byte-identical, in decode order
    assert mp4.split_mp4_frames(buf) == jpegs
    # a sampled frame pixel-decodes to the same image as its source JPEG
    got = codecs.decode_jpeg(mp4.extract_mp4_frames(buf, [3])[0])
    assert (got == codecs.decode_jpeg(jpegs[3])).all()
    # sniffing dispatch: MP4 decodes its FIRST sample like AVI does
    assert codecs.sniff_image_format(buf) == "mp4"
    assert (codecs.decode_image(buf) == codecs.decode_jpeg(jpegs[0])).all()


@pytest.mark.parametrize("spc", [1, 2, 5, 7])
def test_mp4_stsc_chunking_variants(spc):
    # uniform runs, a short-tail run, one-chunk and one-sample-per-chunk
    # shapes all expand to the same per-sample index
    buf, jpegs = _mk_mp4(7, samples_per_chunk=spc)
    assert mp4.split_mp4_frames(buf) == jpegs


def test_mp4_moov_first_streaming_layout():
    # faststart layout: metadata before media; stco offsets stay absolute
    buf, jpegs = _mk_mp4(6, moov_first=True)
    assert buf[:4] != b"" and buf.find(b"moov") < buf.find(b"mdat")
    assert mp4.split_mp4_frames(buf) == jpegs
    assert mp4.mp4_info(buf)["n_frames"] == 6


def test_mp4_wide_64bit_shapes():
    # the >4 GB shapes: version-1 mvhd/tkhd/mdhd, co64 chunk offsets and a
    # largesize mdat — all three parser paths in one file
    buf, jpegs = _mk_mp4(5, wide=True, samples_per_chunk=2)
    assert b"co64" in buf and b"stco" not in buf
    info = mp4.mp4_info(buf)
    assert info["n_frames"] == 5 and info["fps"] == 10.0
    assert mp4.split_mp4_frames(buf) == jpegs
    buf2, jpegs2 = _mk_mp4(4, wide=True, moov_first=True)
    assert mp4.split_mp4_frames(buf2) == jpegs2


def test_mp4_frame_index_never_reads_mdat():
    # the index must be computable from a prefix that ends before mdat —
    # the seek shape: sampling reads O(sample tables) + selected ranges
    buf, jpegs = _mk_mp4(5, moov_first=True)
    mdat_start = buf.find(b"mdat") - 4
    idx_full = mp4.mp4_frame_index(buf)
    truncated = buf[:mdat_start] + b"\0" * (len(buf) - mdat_start)
    assert mp4.mp4_frame_index(truncated) == idx_full


def test_mp4_truncated_raises():
    buf, _ = _mk_mp4(3)
    with pytest.raises(ValueError):
        mp4.split_mp4_frames(buf[: len(buf) // 2])
    b2, _ = _mk_mp4(3, moov_first=True)
    with pytest.raises(ValueError):
        mp4.split_mp4_frames(b2[: len(b2) - 4])
    assert not mp4.is_mp4(b"RIFF\x04\x00\x00\x00AVI ")
    with pytest.raises(ValueError):
        mp4.mp4_info(struct.pack(">I", 16) + b"ftypisom" + b"\0" * 8)


def test_mp4_stsc_stco_disagreement_raises():
    buf, _ = _mk_mp4(6, samples_per_chunk=2)
    # corrupt stsz's declared sample count: tables no longer cover it
    at = buf.find(b"stsz") + 4 + 4 + 4  # fourcc + version/flags + uniform
    bad = buf[:at] + struct.pack(">I", 9) + buf[at + 4:]
    with pytest.raises(ValueError):
        mp4.mp4_frame_index(bad)


@pytest.mark.parametrize("fpf", [1, 2, 3, 7, 10])
def test_fmp4_fragmented_roundtrip(fpf):
    # the fMP4/DASH layout: zero-entry stbl + mvex/trex, samples in
    # moof/tfhd/trun runs — one moof+mdat pair per frames_per_fragment
    frames_px = synth_gif_frames(7, 7)
    jpegs = [codecs.encode_jpeg(np.asarray(f)) for f in frames_px]
    buf = mp4.encode_fmp4_mjpeg(jpegs, frames_per_fragment=fpf)
    assert buf.count(b"moof") >= -(-7 // fpf)
    assert mp4.split_mp4_frames(buf) == jpegs
    assert mp4.mp4_info(buf)["n_frames"] == 7
    assert codecs.sniff_image_format(buf) == "mp4"


def test_fmp4_tfhd_default_sample_size():
    # equal-length samples via tfhd default-sample-size, no trun sizes —
    # the fixed-record shape; also pins the trun-size-absent parse path
    fake = [bytes([i]) * 64 for i in range(5)]
    buf = mp4.encode_fmp4_mjpeg(fake, frames_per_fragment=2,
                                use_default_size=True)
    assert mp4.split_mp4_frames(buf) == fake
    with pytest.raises(ValueError):
        mp4.encode_fmp4_mjpeg([b"ab", b"abc"], use_default_size=True)


def test_fmp4_fragment_index_never_reads_mdat():
    # fragment offsets/sizes are recoverable with every mdat body zeroed
    frames_px = synth_gif_frames(3, 6)
    jpegs = [codecs.encode_jpeg(np.asarray(f)) for f in frames_px]
    buf = mp4.encode_fmp4_mjpeg(jpegs, frames_per_fragment=2)
    idx = mp4.mp4_frame_index(buf)
    blanked = bytearray(buf)
    for off, size in idx:
        blanked[off:off + size] = b"\0" * size
    assert mp4.mp4_frame_index(bytes(blanked)) == idx


def test_frame_sampler_real_fmp4_leg():
    t = multimodal.synth_media_table(12, media_type="video", payload="fmp4")
    out = multimodal.sample_frames(
        rd.from_arrow(t), every_n=10, mode="real").to_pandas()
    want = sum(len(range(0, (i % 30) + 1, 10)) for i in range(12))
    assert len(out) == want


def test_frame_sampler_real_mp4_leg():
    t = multimodal.synth_media_table(12, media_type="video", payload="mp4")
    out = multimodal.sample_frames(
        rd.from_arrow(t), every_n=10, mode="real").to_pandas()
    # closed form: n_frames=(i%30)+1, sampled every 10
    want = sum(len(range(0, (i % 30) + 1, 10)) for i in range(12))
    assert len(out) == want
    got = out.groupby("media_id")["frame_idx"].max().to_dict()
    for i in range(12):
        nf = (i % 30) + 1
        assert got[f"m-{i:06d}"] == ((nf - 1) // 10) * 10
