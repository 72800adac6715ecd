"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in this
container — the reference's image path, `/root/reference/tfdata/core/example.go:131-146`,
uses Go's stdlib codecs): ``mode="fake"`` produces deterministic
bytes-derived features so the Ray-side plumbing — schema, actor-pool
signatures, batch sizing, output layout — is real and tested; ``mode="real"``
raises ``NotImplementedError`` at the exact seam where PIL/libsndfile/ffmpeg
would plug in.

Payload-aware batch sizing: media rows are KB–MB wide, so these stages use
small ``batch_size`` (default 64) — batch_bytes ≈ batch_size × payload, and
batch_bytes × concurrency must fit the worker heap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.large_binary()),
        ("media_type", pa.string()),  # "image" | "audio" | "video"
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)


def synth_media_table(n: int, media_type: str = "image", seed: int = 5) -> pa.Table:
    """Deterministic fake media rows (payload = index-derived bytes)."""
    ids = [f"m-{i:06d}" for i in range(n)]
    payloads = [bytes(((np.arange(256) * (i + seed)) % 251).astype(np.uint8)) for i in range(n)]
    w = [(64 + (i % 4) * 32) for i in range(n)]
    return pa.table(
        {
            "media_id": pa.array(ids),
            "payload": pa.array(payloads, pa.large_binary()),
            "media_type": pa.array([media_type] * n),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(w, pa.int32()),
            "sample_rate": pa.array([16000] * n, pa.int32()),
            "n_frames": pa.array([(i % 30) + 1 for i in range(n)], pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool decode stage: payload bytes → fixed-dim feature vector.

    real: PIL decode + resize + channel stats — NOT AVAILABLE here.
    fake: deterministic 8-dim moments of the raw bytes (tests the plumbing).
    """

    def __init__(self, mode: str = "fake", out_dim: int = 8):
        if mode not in ("fake", "real"):
            raise ValueError(mode)
        self.mode, self.out_dim = mode, out_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/opencv — not in this container; "
                "plug the real kernel in here (same signature)"
            )
        feats = []
        for buf in t["payload"].to_pylist():
            b = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
            chunks = np.array_split(b, self.out_dim)
            feats.append(np.array([c.mean() if len(c) else 0.0 for c in chunks]))
        return pa.table(
            {
                "media_id": t["media_id"],
                "features": pa.array([f for f in feats], pa.list_(pa.float64())),
                "width": t["width"],
                "height": t["height"],
            }
        )


class FrameSampler:
    """Video frame-sampling stub: emits one row per sampled frame index
    (flat-map shape: output rows ≠ input rows)."""

    def __init__(self, every_n: int = 10, mode: str = "fake"):
        self.every_n, self.mode = every_n, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("frame extraction requires ffmpeg — stub seam")
        ids, frames = [], []
        for mid, n in zip(t["media_id"].to_pylist(), t["n_frames"].to_pylist()):
            for f in range(0, int(n), self.every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table({"media_id": pa.array(ids), "frame_idx": pa.array(frames, pa.int32())})


class ImageResizer:
    """Resize stub: payload → payload' with updated (width, height).

    real: PIL `Image.resize` — NOT AVAILABLE here.
    fake: deterministic byte decimation proportional to the area ratio, so
    output payload length scales like a real resize would and downstream
    batch-size math is exercised honestly.
    """

    def __init__(self, target_w: int, target_h: int, mode: str = "fake"):
        self.target_w, self.target_h, self.mode = target_w, target_h, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("image resize requires PIL — stub seam")
        payloads = []
        for buf, w, h in zip(t["payload"].to_pylist(), t["width"].to_pylist(),
                             t["height"].to_pylist()):
            ratio = max((w * h) / max(self.target_w * self.target_h, 1), 1.0)
            step = max(int(round(ratio)), 1)
            payloads.append(bytes(np.frombuffer(buf, dtype=np.uint8)[::step]))
        n = len(t)
        return pa.table(
            {
                "media_id": t["media_id"],
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array([self.target_w] * n, pa.int32()),
                "height": pa.array([self.target_h] * n, pa.int32()),
            }
        )


class AudioFeaturizer:
    """Audio feature-extract stub: payload PCM bytes → per-window RMS energy
    (fixed n_windows) — the librosa/libsndfile seam.

    fake: interprets payload bytes as uint8 samples; real would decode at
    ``sample_rate`` and window properly."""

    def __init__(self, n_windows: int = 4, mode: str = "fake"):
        self.n_windows, self.mode = n_windows, mode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.mode == "real":
            raise NotImplementedError("audio decode requires libsndfile/ffmpeg — stub seam")
        feats = []
        for buf in t["payload"].to_pylist():
            b = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
            wins = np.array_split(b, self.n_windows)
            feats.append(np.array([np.sqrt((w ** 2).mean()) if len(w) else 0.0 for w in wins]))
        return pa.table(
            {
                "media_id": t["media_id"],
                "rms": pa.array(list(feats), pa.list_(pa.float64())),
                "sample_rate": t["sample_rate"],
            }
        )


def resize_images(ds: rd.Dataset, target_w: int = 32, target_h: int = 32,
                  mode: str = "fake", concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(
        ImageResizer, fn_constructor_args=(target_w, target_h, mode),
        batch_format="pyarrow", batch_size=64, concurrency=concurrency,
    )


def audio_features(ds: rd.Dataset, n_windows: int = 4, mode: str = "fake",
                   concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(
        AudioFeaturizer, fn_constructor_args=(n_windows, mode),
        batch_format="pyarrow", batch_size=64, concurrency=concurrency,
    )


def decode_images(ds: rd.Dataset, mode: str = "fake", concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(
        ImageDecoder, fn_constructor_args=(mode,), batch_format="pyarrow",
        batch_size=64, concurrency=concurrency,  # small: payload-heavy rows
    )


def sample_frames(ds: rd.Dataset, every_n: int = 10, mode: str = "fake") -> rd.Dataset:
    return ds.map_batches(
        FrameSampler, fn_constructor_args=(every_n, mode), batch_format="pyarrow",
        batch_size=64, concurrency=(1, 4),
    )
