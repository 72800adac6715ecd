"""MPEG-1 video codec (functions/mpeg.py): from-spec ISO 11172-2 intra
encode/decode, Annex B VLC tables, systems-layer mux/demux."""

import numpy as np
import pytest

from go_tfdata_ray.functions import mpeg
from go_tfdata_ray.functions.multimodal import synth_image


def _clips(n, w, h):
    return np.stack([synth_image(i, w, h) for i in range(n)])


def test_roundtrip_mae_and_shape():
    frames = _clips(4, 32, 32)
    es = mpeg.encode_mpeg1(frames, qscale=2)
    dec = mpeg.decode_mpeg1(es)
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(float) - frames).mean() < 4.0


def test_non_mb_aligned_dims_crop():
    frames = _clips(3, 50, 38)
    dec = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=4))
    assert dec.shape == (3, 38, 50, 3)
    assert np.abs(dec.astype(float) - frames).mean() < 8.0


def test_flat_gray_is_lossless_and_tiny():
    flat = np.full((2, 16, 16, 3), 128, np.uint8)
    es = mpeg.encode_mpeg1(flat, qscale=8)
    assert len(es) < 100
    assert np.array_equal(mpeg.decode_mpeg1(es), flat)


def test_count_and_dims_without_decode():
    frames = _clips(7, 16, 16)
    es = mpeg.encode_mpeg1(frames, gop_size=3)
    assert mpeg.count_mpeg_frames(es) == 7
    assert mpeg.mpeg_dims(es) == (16, 16)


def test_escape_coding_matches_table_coding():
    # every AC coefficient through the 6-bit-run escape path must decode
    # to the same stream the Table B.5 codes produce — cross-checks the
    # table against the spec's escape definition over real coefficients
    frames = _clips(3, 32, 32)
    a = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=1))
    b = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=1,
                                            force_escape=True))
    assert np.array_equal(a, b)


def test_ac_table_is_prefix_free():
    codes = [c for _, _, c in mpeg._AC_TABLE] + [mpeg._AC_EOB,
                                                 mpeg._AC_ESCAPE]
    assert len(set(codes)) == len(codes)
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a), (a, b)
    # and the run/level domain is unique
    keys = [(r, lv) for r, lv, _ in mpeg._AC_TABLE]
    assert len(set(keys)) == len(keys) == 111


def test_mba_table_is_prefix_free():
    codes = list(mpeg._MBA.values()) + [mpeg._MBA_ESCAPE, mpeg._MBA_STUFFING]
    for i, a in enumerate(codes):
        for j, b in enumerate(codes):
            if i != j:
                assert not b.startswith(a)


def test_escape_level_extremes_roundtrip():
    # drive the 16-bit double-byte escape forms directly through the
    # writer/reader pair: levels past ±127 use the 0x00/0x80 marker byte
    from go_tfdata_ray.functions.jpeg import _BitReader

    for level in (1, -1, 127, -127, 128, -128, 200, -200, 255, -255):
        bw = mpeg._BW()
        mpeg._enc_ac(bw, 5, level, force_escape=True)
        bw.align()
        br = _BitReader(bytes(bw.buf))
        assert br.peek16() >> 10 == 0b000001
        br.skip(6)
        assert br.read(6) == 5
        b = br.read(8)
        if b == 0x00:
            got = br.read(8)
        elif b == 0x80:
            got = br.read(8) - 256
        else:
            got = b if b < 128 else b - 256
        assert got == level


def test_ps_mux_demux_roundtrip():
    es = mpeg.encode_mpeg1(_clips(5, 16, 16), qscale=4)
    ps = mpeg.mux_mpeg_ps(es, packet_size=256)
    assert ps[:4] == b"\x00\x00\x01\xba"
    assert mpeg.demux_mpeg_ps(ps) == es
    # every top-level entry point accepts PS directly
    assert mpeg.count_mpeg_frames(ps) == 5
    assert mpeg.mpeg_dims(ps) == (16, 16)
    assert np.array_equal(mpeg.decode_mpeg1(ps), mpeg.decode_mpeg1(es))


def test_extract_is_seek_shaped():
    frames = _clips(9, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2)
    full = mpeg.decode_mpeg1(es)
    some = mpeg.extract_mpeg_frames(es, [0, 4, 8])
    assert np.array_equal(some[0], full[0])
    assert np.array_equal(some[1], full[4])
    assert np.array_equal(some[2], full[8])
    with pytest.raises(IndexError):
        mpeg.extract_mpeg_frames(es, [9])


def test_d_picture_spliced_without_slices_decodes_mid_gray():
    es = mpeg.encode_mpeg1(_clips(2, 16, 16))
    # splice a D-picture header (tref=2, type=100) before the sequence end
    d_hdr = b"\x00\x00\x01\x00" + bytes([0x00, 0xA0, 0xFF, 0xF8, 0x00])
    es_d = es[:-4] + d_hdr + b"\x00\x00\x01\xb7"
    assert mpeg.count_mpeg_frames(es_d) == 3
    assert len(mpeg.extract_mpeg_frames(es_d, [0, 1])) == 2  # I pictures fine
    # a D picture with no coded macroblocks paints the uncoded-MB
    # mid-gray fallback (it used to raise — the seam is closed)
    got = mpeg.extract_mpeg_frames(es_d, [2])[0]
    assert got.shape == (16, 16, 3)
    assert np.abs(got.astype(int) - 128).max() <= 2


def test_b_picture_without_both_anchors_raises():
    seq = mpeg._SeqState()
    seq.w = seq.h = 16
    hdr = bytes([0x00, 0x7F, 0xFF, 0xFA, 0x80])  # tref=1, type=3(B)
    with pytest.raises(ValueError):
        mpeg._decode_B(hdr, [], seq, None, None)


def test_ibp_roundtrip_and_display_reordering():
    # coded order is anchors-first (I P B P B ...); the decoder must undo
    # the per-GOP temporal_reference permutation, so per-display-frame MAE
    # against the SOURCE frame at the same index is the ordering oracle
    # (synth_image differs per index far more than the codec error bound).
    frames = _clips(9, 48, 32)
    es = mpeg.encode_mpeg1(frames, qscale=4, mode="ibp", gop_size=8)
    pics = list(mpeg._iter_pictures(es))
    assert [p[0] for p in pics] == [1, 2, 3, 2, 3, 2, 3, 2, 1]
    assert [p[5] for p in pics] == [0, 2, 1, 4, 3, 6, 5, 7, 0]
    dec = mpeg.decode_mpeg1(es)
    assert dec.shape == frames.shape
    for i in range(9):
        assert np.abs(dec[i].astype(float) - frames[i]).mean() < 8.0, i
    assert mpeg.count_mpeg_frames(es) == 9


def test_ibp_extract_decodes_only_anchor_closure():
    # display frame 1 is the first B: its closure is I(disp 0) + P(disp 2)
    # — exactly 3 of the 9 coded pictures touch the pixel decoders
    frames = _clips(9, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ibp", gop_size=8)
    full = mpeg.decode_mpeg1(es)
    calls = {"I": 0, "P": 0, "B": 0}
    oi, op, ob = mpeg._decode_I, mpeg._decode_P, mpeg._decode_B
    mpeg._decode_I = lambda *a: calls.__setitem__("I", calls["I"] + 1) or oi(*a)
    mpeg._decode_P = lambda *a: calls.__setitem__("P", calls["P"] + 1) or op(*a)
    mpeg._decode_B = lambda *a: calls.__setitem__("B", calls["B"] + 1) or ob(*a)
    try:
        out = mpeg.extract_mpeg_frames(es, [1])
    finally:
        mpeg._decode_I, mpeg._decode_P, mpeg._decode_B = oi, op, ob
    assert calls == {"I": 1, "P": 1, "B": 1}
    assert np.array_equal(out[0], full[1])


def test_ibp_static_clip_is_exact_and_tiny():
    # a static clip's B pictures are pure prediction (zero residual,
    # skipped middles): decode must be an exact copy of the I picture
    still = np.full((7, 32, 48, 3), 128, np.uint8)
    es = mpeg.encode_mpeg1(still, qscale=4, mode="ibp", gop_size=7)
    es_i = mpeg.encode_mpeg1(still, qscale=4)
    assert len(es) < len(es_i)
    assert np.array_equal(mpeg.decode_mpeg1(es), still)


def test_ibp_force_escape_identical():
    frames = _clips(6, 32, 32)
    a = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=2, mode="ibp",
                                            gop_size=6))
    b = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=2, mode="ibp",
                                            gop_size=6, force_escape=True))
    assert np.array_equal(a, b)


def test_ibp_in_program_stream():
    frames = _clips(7, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ibp", gop_size=4)
    ps = mpeg.mux_mpeg_ps(es, packet_size=128)
    assert mpeg.count_mpeg_frames(ps) == 7
    assert np.array_equal(mpeg.decode_mpeg1(ps), mpeg.decode_mpeg1(es))


def _full_pel_bit(es):
    # forward full_pel flag of the first P picture header
    for pt, hdr, _sl, _seq, _g, _t in mpeg._iter_pictures(es):
        if pt == 2:
            br = mpeg._BitReader(hdr)
            br.read(29)  # tref + type + vbv_delay
            return br.read(1)
    raise AssertionError("no P picture")


def test_half_pel_roundtrip_and_no_drift():
    frames = _clips(8, 48, 32)
    for mode in ("ip", "ibp"):
        es = mpeg.encode_mpeg1(frames, qscale=4, mode=mode, gop_size=4,
                               half_pel=True)
        assert _full_pel_bit(es) == 0  # real fractional-MC streams
        dec = mpeg.decode_mpeg1(es)
        assert np.abs(dec.astype(float) - frames).mean() < 8.0
    # decoder reproduces the encoder's local reconstruction bit-exactly
    # at every picture of a half-pel P chain (the no-drift invariant)
    frames = _clips(6, 32, 32)
    recons = []
    orig_i, orig_p = mpeg._encode_I_picture, mpeg._encode_P_picture
    mpeg._encode_I_picture = lambda *a, **k: recons.append(orig_i(*a, **k)) or recons[-1]
    mpeg._encode_P_picture = lambda *a, **k: recons.append(orig_p(*a, **k)) or recons[-1]
    try:
        es = mpeg.encode_mpeg1(frames, qscale=2, mode="ip", gop_size=6,
                               half_pel=True)
    finally:
        mpeg._encode_I_picture, mpeg._encode_P_picture = orig_i, orig_p
    prev = None
    for i, (pt, hdr, sl, seq, _g, _t) in enumerate(mpeg._iter_pictures(es)):
        prev = (mpeg._decode_I(sl, seq) if pt == 1
                else mpeg._decode_P(hdr, sl, seq, prev))
        for k in range(3):
            assert np.array_equal(prev[k], recons[i][k]), (i, k)


def test_half_pel_wins_on_subpel_motion():
    # f2[x] = (f1[x] + f1[x+1]) // 2 is EXACTLY the dx=+1 half-pel
    # prediction (same truncating average as _mc_pred), so the half-pel
    # encoder's residuals collapse where the full-pel encoder must code
    # real detail — the stream must be decisively smaller
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 256, size=(32, 49, 3), dtype=np.uint8)
    f2 = ((f1[:, :-1].astype(np.int32) + f1[:, 1:].astype(np.int32))
          // 2).astype(np.uint8)
    clip = np.stack([f1[:, :48], f2])
    eh = mpeg.encode_mpeg1(clip, qscale=4, mode="ip", gop_size=2,
                           half_pel=True)
    ef = mpeg.encode_mpeg1(clip, qscale=4, mode="ip", gop_size=2)
    assert len(eh) < 0.85 * len(ef)
    # noise intra-codes lossily, so compare against the full-pel decode:
    # fractional MC must not cost quality while saving the bits
    mae_h = np.abs(mpeg.decode_mpeg1(eh)[1].astype(float) - clip[1]).mean()
    mae_f = np.abs(mpeg.decode_mpeg1(ef)[1].astype(float) - clip[1]).mean()
    assert mae_h <= mae_f + 0.5


def test_ts_mux_demux_roundtrip():
    frames = _clips(7, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ibp", gop_size=4)
    ts = mpeg.mux_mpeg_ts(es)
    assert len(ts) % mpeg.TS_PACKET == 0
    assert mpeg.demux_mpeg_ts(ts) == es
    # the decoder sniffs TS transparently (like PS)
    assert mpeg.count_mpeg_frames(ts) == 7
    assert np.array_equal(mpeg.decode_mpeg1(ts), mpeg.decode_mpeg1(es))
    full = mpeg.decode_mpeg1(es)
    some = mpeg.extract_mpeg_frames(ts, [1, 5])
    assert np.array_equal(some[0], full[1])
    assert np.array_equal(some[1], full[5])


def test_ts_small_pes_and_frequent_psi():
    es = mpeg.encode_mpeg1(_clips(5, 16, 16), qscale=4)
    ts = mpeg.mux_mpeg_ts(es, pes_size=333, psi_interval=7)
    assert mpeg.demux_mpeg_ts(ts) == es


def test_ts_resync_and_robustness():
    es = mpeg.encode_mpeg1(_clips(3, 16, 16), qscale=4)
    ts = mpeg.mux_mpeg_ts(es)
    # sync recovery past a garbage prefix
    assert mpeg.demux_mpeg_ts(b"\x12\x34\x56" + ts) == es
    # duplicate packet (same continuity counter) is dropped, null packets
    # and adaptation-only packets are ignored
    pkts = [ts[i:i + 188] for i in range(0, len(ts), 188)]
    null = b"\x47\x1f\xff\x10" + b"\xff" * 184
    dup = pkts[:3] + [pkts[2], null] + pkts[3:]
    assert mpeg.demux_mpeg_ts(b"".join(dup)) == es


def test_ts_psi_crc_is_checked():
    import pytest as _pt
    es = mpeg.encode_mpeg1(_clips(2, 16, 16), qscale=4)
    ts = bytearray(mpeg.mux_mpeg_ts(es))
    # corrupt a byte inside the PAT section body — the PSI payload sits at
    # the END of packet 0 (the mux's adaptation-field stuffing leads)
    ts[180] ^= 0x5A
    with _pt.raises(ValueError):
        mpeg.demux_mpeg_ts(bytes(ts))


def test_ibp_odd_gop_tails():
    # gop_size=4 over 9 frames -> GOP lengths 4, 4, 1; the length-1 GOP
    # is a lone I with no B loop, and length-4 GOPs end on a P anchor
    frames = _clips(9, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ibp", gop_size=4)
    dec = mpeg.decode_mpeg1(es)
    for i in range(9):
        assert np.abs(dec[i].astype(float) - frames[i]).mean() < 8.0, i


def test_ip_mode_roundtrip_and_compression():
    frames = _clips(8, 48, 32)
    es_ip = mpeg.encode_mpeg1(frames, qscale=4, mode="ip", gop_size=4)
    es_i = mpeg.encode_mpeg1(frames, qscale=4)
    assert len(es_ip) < len(es_i)  # temporal prediction actually pays
    dec = mpeg.decode_mpeg1(es_ip)
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(float) - frames).mean() < 8.0
    assert mpeg.count_mpeg_frames(es_ip) == 8


def test_ip_no_drift_along_gop():
    # the real invariant: the encoder predicts from its own LOCAL
    # RECONSTRUCTION, so the decoder reproduces it bit-exactly at every
    # picture of the chain — drift would show as growing divergence.
    # Per-frame error vs the SOURCE may wiggle with the quantizer dead
    # zone, so assert it stays bounded, not monotone.
    frames = _clips(10, 32, 32)
    recons = []
    orig_i, orig_p = mpeg._encode_I_picture, mpeg._encode_P_picture
    mpeg._encode_I_picture = lambda *a, **k: recons.append(orig_i(*a, **k)) or recons[-1]
    mpeg._encode_P_picture = lambda *a, **k: recons.append(orig_p(*a, **k)) or recons[-1]
    try:
        es = mpeg.encode_mpeg1(frames, qscale=2, mode="ip", gop_size=10)
    finally:
        mpeg._encode_I_picture, mpeg._encode_P_picture = orig_i, orig_p
    prev = None
    for i, (pt, hdr, sl, seq, _g, _t) in enumerate(mpeg._iter_pictures(es)):
        prev = (mpeg._decode_I(sl, seq) if pt == 1
                else mpeg._decode_P(hdr, sl, seq, prev))
        for k in range(3):
            assert np.array_equal(prev[k], recons[i][k]), (i, k)
    dec = mpeg.decode_mpeg1(es)
    errs = [np.abs(dec[i].astype(float) - frames[i]).mean()
            for i in range(10)]
    assert max(errs) < 8.0, errs


def test_ip_extract_decodes_reference_chain():
    frames = _clips(9, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ip", gop_size=3)
    full = mpeg.decode_mpeg1(es)
    # frame 5 is a P inside the second GOP: needs 3 (I) and 4 decoded
    some = mpeg.extract_mpeg_frames(es, [5, 8])
    assert np.array_equal(some[0], full[5])
    assert np.array_equal(some[1], full[8])


def test_ip_skipped_macroblocks_copy_reference():
    # flat gray intra-codes losslessly, so a static clip's P pictures
    # carry ZERO residual: middle macroblocks are skipped outright (the
    # slice-first/last ones are coded as 'MC, not coded'), the stream is
    # tiny, and every decoded frame is an exact copy of the I picture
    still = np.full((6, 32, 48, 3), 128, np.uint8)  # mb_w=3: a middle MB
    es = mpeg.encode_mpeg1(still, qscale=4, mode="ip", gop_size=6)
    es_i = mpeg.encode_mpeg1(still, qscale=4)
    assert len(es) < len(es_i)
    dec = mpeg.decode_mpeg1(es)
    assert np.array_equal(dec, still)


def test_ip_intra_fallback_macroblocks():
    # force intra MBs inside P pictures via a tiny SAD threshold — the
    # decoder's intra-in-P path (DC prediction chain, Table B.2b '00011')
    frames = _clips(6, 32, 32)
    es = mpeg.encode_mpeg1(frames, qscale=4, mode="ip", gop_size=6,
                           p_intra_sad=0.0)
    dec = mpeg.decode_mpeg1(es)
    assert np.abs(dec.astype(float) - frames).mean() < 8.0


def test_ip_force_escape_identical():
    frames = _clips(5, 32, 32)
    a = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=2, mode="ip",
                                            gop_size=5))
    b = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, qscale=2, mode="ip",
                                            gop_size=5, force_escape=True))
    assert np.array_equal(a, b)


def test_ip_in_program_stream():
    frames = _clips(7, 16, 16)
    es = mpeg.encode_mpeg1(frames, qscale=2, mode="ip", gop_size=4)
    ps = mpeg.mux_mpeg_ps(es, packet_size=128)
    assert mpeg.count_mpeg_frames(ps) == 7
    assert np.array_equal(mpeg.decode_mpeg1(ps), mpeg.decode_mpeg1(es))


def test_custom_intra_matrix_stream_decodes():
    # build a sequence header carrying load_intra_quantizer_matrix=1 with
    # a flat all-16 matrix and splice it onto an encoded stream's pictures
    import struct

    flat = np.full((2, 16, 16, 3), 128, np.uint8)
    es = mpeg.encode_mpeg1(flat, qscale=8)
    bw = mpeg._BW()
    bw.buf += struct.pack(">I", 0x000001B3)
    bw.write(16, 12)
    bw.write(16, 12)
    bw.write(1, 4)
    bw.write(3, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(1, 1)  # load_intra_quantizer_matrix
    for _ in range(64):
        bw.write(16, 8)
    bw.write(0, 1)
    es_cm = bytes(bw.buf) + es[12:]  # original header is 4+8 bytes
    dec = mpeg.decode_mpeg1(es_cm)
    assert np.array_equal(dec, flat)  # DC-only stream: matrix-insensitive


def test_decoder_survives_corruption():
    # a flipped byte may still parse as SOME valid VLC sequence — the
    # contract is no crash/hang: either a clean error or a decoded frame
    # of the declared dimensions
    es = mpeg.encode_mpeg1(_clips(1, 16, 16), qscale=1)
    slice_off = es.find(b"\x00\x00\x01\x01")
    for k in range(6, 14):
        bad = bytearray(es)
        bad[slice_off + k] ^= 0xFF
        try:
            dec = mpeg.decode_mpeg1(bytes(bad))
            assert dec.shape[1:] == (16, 16, 3)
        except (ValueError, IndexError, NotImplementedError):
            pass

    # hard truncation mid-entropy must error cleanly, not hang
    with pytest.raises((ValueError, IndexError)):
        seq = mpeg._SeqState()
        seq.w = seq.h = 16
        mpeg._decode_I([(1, es[slice_off + 4:slice_off + 7])], seq)


# -- D pictures (DC-only fast-scan type) -------------------------------------

def test_d_pictures_roundtrip_mb_flat_exact():
    # frames flat per 16x16 macroblock: every DCT is DC-only, so the
    # D-picture reduction is lossless up to color-conversion rounding
    rng = np.random.default_rng(11)
    vals = rng.integers(16, 240, (3, 2, 3, 3), dtype=np.uint8)
    frames = np.repeat(np.repeat(vals, 16, axis=1), 16, axis=2)
    es = mpeg.encode_mpeg1(frames, mode="d")
    assert mpeg.count_mpeg_frames(es) == 3
    dec = mpeg.decode_mpeg1(es)
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 4


def test_d_pictures_are_blockwise_dc_of_content():
    # on real content, a decoded D picture's luma must match the 8x8
    # block means of the intra decode (DC quant step 8 => within 4, plus
    # RGB<->YCbCr rounding)
    frames = _clips(2, 48, 32)
    d = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, mode="d"))
    i = mpeg.decode_mpeg1(mpeg.encode_mpeg1(frames, mode="intra", qscale=1))

    def luma(x):
        f = x.astype(np.float64)
        return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]

    yi = luma(i).reshape(2, 4, 8, 6, 8).mean(axis=(2, 4))
    yd = luma(d).reshape(2, 4, 8, 6, 8).mean(axis=(2, 4))
    assert np.abs(yi - yd).max() < 6.0


def test_d_pictures_extract_and_ps_mux():
    frames = _clips(5, 32, 32)
    es = mpeg.encode_mpeg1(frames, mode="d", gop_size=2)
    full = mpeg.decode_mpeg1(es)
    got = mpeg.extract_mpeg_frames(es, [0, 3])
    assert np.array_equal(got[0], full[0])
    assert np.array_equal(got[1], full[3])
    ps = mpeg.mux_mpeg_ps(es)
    assert np.array_equal(mpeg.decode_mpeg1(ps), full)
