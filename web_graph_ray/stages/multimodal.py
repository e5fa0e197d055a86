"""Multimodal (image/audio/video) stages — Ray-side plumbing, stubbed codecs.

Design for opaque ``binary`` payload columns with typed metadata
(mime/width/height/duration).  The decode/resize/feature kernels would
use PIL/torchaudio/decord — none of which exist in this container — so
the codec boundary is stubbed two ways:

- ``decoder="strict"`` raises NotImplementedError (the honest prod stub)
- ``decoder="fake"``  produces deterministic pseudo-decodes derived
  from the payload bytes, so the Ray-side plumbing (schemas, batch
  sizing, actor-pool shape, output layout) is fully exercised in tests

The stage SHAPE is the real deliverable: a callable class (actor pool —
model/codec load happens once per actor in ``__init__``), small batch
sizes because payload rows are MBs, Arrow binary in / fixed-shape
tensor columns out.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = ["ImageDecode", "AudioFeatures", "VideoFrameSample", "image_batch_schema"]


def image_batch_schema() -> pa.Schema:
    return pa.schema(
        [
            ("item_id", pa.int64()),
            ("payload", pa.binary()),
            ("mime", pa.string()),
        ]
    )


def _fake_pixels(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic pseudo-decode: bytes → seeded uint8 image tensor."""
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class ImageDecode:
    """Actor-pool stage: binary payload → fixed-size RGB tensor + stats.

    Use as ``ds.map_batches(ImageDecode, fn_constructor_kwargs=...,
    concurrency=N, batch_size=small, num_cpus=1)`` — payloads are MBs,
    so batch_size × concurrency must be sized to worker heaps
    (SURVEY.md §4.2 memory row).
    """

    def __init__(self, height: int = 32, width: int = 32, decoder: str = "strict"):
        # per-actor setup: in production this is codec/model load
        self.h, self.w = height, width
        self.decoder = decoder

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            return _fake_pixels(payload, self.h, self.w)
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "run with decoder='fake' for plumbing tests"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        pixels = [self._decode(p) for p in batch["payload"].to_pylist()]
        arr = np.stack(pixels)  # (n, h, w, 3)
        flat = arr.reshape(len(pixels), -1)
        return pa.Table.from_pydict(
            {
                "item_id": batch["item_id"],
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), type=pa.uint8()), self.h * self.w * 3
                ),
                "mean_intensity": pa.array(
                    flat.mean(axis=1, dtype=np.float64), type=pa.float64()
                ),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: binary video payload → ``n_frames`` uniformly
    sampled RGB frames + their timestamps.

    The frame-sample shape of a training-data video pipeline: rows are
    LARGE (MBs-GBs of encoded video), so this stage is meant to run as
    ``map_batches(VideoFrameSample, concurrency=N, batch_size=1..4,
    num_cpus=c)`` with output one row per (item, frame) — the 1→N
    flat-map keeps frame tensors individually addressable downstream.
    In production ``_decode_meta``/``_decode_frame`` wrap a
    decord/ffmpeg handle opened once per actor in ``__init__``; here
    they are stubbed (strict raises, fake derives a deterministic
    duration + frames from the payload bytes)."""

    def __init__(
        self,
        n_frames: int = 8,
        height: int = 32,
        width: int = 32,
        decoder: str = "strict",
    ):
        self.n, self.h, self.w = n_frames, height, width
        self.decoder = decoder

    def _duration_sec(self, payload: bytes) -> float:
        if self.decoder != "fake":
            raise NotImplementedError(
                "video codecs are not available in this environment; "
                "run with decoder='fake' for plumbing tests"
            )
        seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
        return 1.0 + (seed % 600_000) / 1000.0  # 1..601 s, deterministic

    def __call__(self, batch: pa.Table) -> pa.Table:
        item_ids, frame_idx, ts, tensors = [], [], [], []
        for item, p in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            dur = self._duration_sec(p)
            for k in range(self.n):
                # uniform mid-point sampling: frame k at (k+0.5)/n of dur
                t = (k + 0.5) / self.n * dur
                item_ids.append(item)
                frame_idx.append(k)
                ts.append(t)
                tensors.append(
                    _fake_pixels(p + k.to_bytes(4, "big"), self.h, self.w)
                )
        flat = np.stack(tensors).reshape(len(tensors), -1) if tensors else np.zeros((0, self.h * self.w * 3), np.uint8)
        return pa.Table.from_pydict(
            {
                "item_id": pa.array(item_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "ts_sec": pa.array(ts, type=pa.float64()),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), type=pa.uint8()),
                    self.h * self.w * 3,
                ),
            }
        )


class AudioFeatures:
    """Actor-pool stage: binary audio payload → frame-sampled features.

    Same plumbing contract as ImageDecode; ``frames`` windows of
    ``feat_dim`` pseudo-MFCCs per item in fake mode."""

    def __init__(self, frames: int = 16, feat_dim: int = 13, decoder: str = "strict"):
        self.frames, self.feat_dim = frames, feat_dim
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            if self.decoder != "fake":
                raise NotImplementedError(
                    "audio codecs are not available in this environment; "
                    "run with decoder='fake' for plumbing tests"
                )
            seed = int.from_bytes(hashlib.sha1(p).digest()[:8], "big")
            rng = np.random.Generator(np.random.PCG64(seed))
            feats.append(rng.standard_normal((self.frames, self.feat_dim)))
        flat = np.stack(feats).reshape(len(feats), -1)
        return pa.Table.from_pydict(
            {
                "item_id": batch["item_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat.reshape(-1), type=pa.float32()),
                    self.frames * self.feat_dim,
                ),
            }
        )
