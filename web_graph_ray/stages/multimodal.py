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

__all__ = ["ImageDecode", "AudioFeatures", "image_batch_schema"]


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
