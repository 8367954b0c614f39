"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBS (image/audio libraries are not
in this container — clearly marked below); everything Ray-side is real
and tested: schema contract, actor-pool stage shape (decoder state
built once per actor in ``__init__``), batch sizing for large binary
rows, and the output layout. Swap ``FakeImageDecoder`` for a real
PIL/ffmpeg-backed class with the same ``__call__`` signature and the
pipeline is production-shaped.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),  # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),  # -1 when unknown pre-decode
        ("height", pa.int32()),
    ]
)


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract image payloads.

    Use as ``ds.map_batches(ImageDecodeStage, batch_format="pyarrow",
    batch_size=64, concurrency=N, num_cpus=1)`` — small batches because
    rows carry large binary payloads (SURVEY/bench memory note).
    """

    def __init__(self, target_size: int = 64, fake: bool = True):
        # once-per-actor setup: a real impl loads PIL/torchvision here
        self.target = target_size
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "real image decoding requires PIL/torchvision — not in this container"
            )

    def _decode_fake(self, payload: bytes) -> np.ndarray:
        # STUB: deterministic fake "decode" — hash-seeded pixels with the
        # declared target size; stands in for JPEG/PNG decode + resize
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(self.target, self.target, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch["payload"].to_pylist():
            img = self._decode_fake(payload)
            # feature extraction: channel means + stds (6-dim)
            f = np.concatenate([img.mean(axis=(0, 1)), img.std(axis=(0, 1))])
            feats.append(f.astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "kind": batch["kind"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "decoded_w": pa.array([self.target] * len(batch), pa.int32()),
                "decoded_h": pa.array([self.target] * len(batch), pa.int32()),
            }
        )


def decode_features(
    media: "rd.Dataset", *, target_size: int = 64, concurrency: int = 2
) -> "rd.Dataset":
    """The actor-pool decode pipeline (fake decode; real Ray plumbing)."""
    return media.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"target_size": target_size, "fake": True},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioWindowStage:
    """Actor-pool stage: window audio payloads and emit per-window
    features. The PCM decode is a STUB (no ffmpeg/soundfile in this
    container — the payload bytes stand in for samples); the windowing
    arithmetic, per-actor setup and (media_id, window_no, feature)
    output layout are the real production shape."""

    def __init__(self, window: int = 4096, hop: int = 2048, fake: bool = True):
        self.window = window
        self.hop = hop
        if not fake:
            raise NotImplementedError(
                "real audio decode requires ffmpeg/soundfile — not in this container"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, wins, feats = [], [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            # STUB decode: bytes as uint8 "samples"
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
            if len(samples) < self.window:
                samples = np.pad(samples, (0, self.window - len(samples)))
            n_win = 1 + (len(samples) - self.window) // self.hop
            for w in range(n_win):
                seg = samples[w * self.hop : w * self.hop + self.window]
                ids.append(mid)
                wins.append(w)
                feats.append(
                    [float(seg.mean()), float(seg.std()), float(np.abs(np.diff(seg)).mean())]
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "window_no": pa.array(wins, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def audio_window_features(
    audio: "rd.Dataset", *, window: int = 4096, hop: int = 2048, concurrency: int = 2
) -> "rd.Dataset":
    """Actor-pool audio windowing pipeline (fake decode; real plumbing —
    small batches because rows carry large binary payloads)."""
    return audio.map_batches(
        AudioWindowStage,
        fn_constructor_kwargs={"window": window, "hop": hop, "fake": True},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample_stage(video: "rd.Dataset", every_n: int = 10) -> "rd.Dataset":
    """Video frame-sampling STUB: emits (media_id, frame_no) rows for a
    deterministic fake frame count derived from payload length (a real
    impl probes the container with ffmpeg)."""

    def sample(batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for mid, payload in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            n_frames = max(1, len(payload) // 1024)  # fake probe
            for f in range(0, n_frames, every_n):
                ids.append(mid)
                frames.append(f)
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()), "frame_no": pa.array(frames, pa.int64())}
        )

    return video.map_batches(sample, batch_format="pyarrow", batch_size=16)
