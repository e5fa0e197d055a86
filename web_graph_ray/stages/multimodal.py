"""Multimodal (image/audio/video) stages — Ray-side plumbing, stubbed codecs.

Design for opaque ``binary`` payload columns with typed metadata
(mime/width/height/duration).  The decode/resize/feature kernels use
PIL / soundfile / av — none of which exist in this container — so the
codec boundary is resolved opportunistically once per actor:

- ``decoder="strict"`` try-imports the real codec in ``__init__``
  (PIL for images, soundfile for audio, av/decord for video) and uses
  it when importable; only when the wheel is truly absent does the
  stage raise NotImplementedError (the honest prod stub)
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


# -- opportunistic codec loaders -------------------------------------------
# Each returns a decode callable when the real library is importable, else
# None.  Called once per actor in __init__ (never per batch/row), so a
# worker pays the import exactly once and the selection is visible in the
# actor's state for tests to assert on.

def _load_image_codec():
    try:
        import io

        from PIL import Image

        def decode(payload: bytes, h: int, w: int) -> np.ndarray:
            img = Image.open(io.BytesIO(payload)).convert("RGB").resize((w, h))
            return np.asarray(img, dtype=np.uint8)

        return decode
    except ImportError:
        return None


def _load_audio_codec():
    try:
        import io

        import soundfile

        def decode(payload: bytes, frames: int, feat_dim: int) -> np.ndarray:
            wav, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            # frame-sampled log-magnitude spectrum features: `frames` equal
            # windows, first `feat_dim` rFFT bins each (numpy-only MFCC stand-in)
            n = max(len(wav) // frames, 1)
            out = np.zeros((frames, feat_dim), dtype=np.float64)
            for i in range(frames):
                win = wav[i * n : (i + 1) * n]
                if len(win):
                    spec = np.abs(np.fft.rfft(win, n=max(2 * feat_dim, len(win))))
                    out[i] = np.log1p(spec[:feat_dim])
            return out

        return decode
    except ImportError:
        return None


def _load_video_codec():
    for mod in ("decord", "av"):
        try:
            __import__(mod)
        except ImportError:
            continue
        import io

        if mod == "decord":
            import decord

            def duration(payload: bytes) -> float:
                vr = decord.VideoReader(io.BytesIO(payload))
                return len(vr) / float(vr.get_avg_fps() or 30.0)

            def frame_at(payload: bytes, t: float, h: int, w: int) -> np.ndarray:
                vr = decord.VideoReader(io.BytesIO(payload), width=w, height=h)
                idx = min(int(t * float(vr.get_avg_fps() or 30.0)), len(vr) - 1)
                return vr[idx].asnumpy().astype(np.uint8)

        else:
            import av

            def duration(payload: bytes) -> float:
                # container.duration is expressed in av.time_base units
                # (av.time_base = Fraction(1, 1_000_000)), so seconds =
                # duration * time_base, and a seek target in those units
                # is t / time_base.
                with av.open(io.BytesIO(payload)) as c:
                    return float((c.duration or 0) * av.time_base)

            def frame_at(payload: bytes, t: float, h: int, w: int) -> np.ndarray:
                with av.open(io.BytesIO(payload)) as c:
                    c.seek(int(t / av.time_base))
                    for frame in c.decode(video=0):
                        return (
                            frame.reformat(width=w, height=h, format="rgb24")
                            .to_ndarray()
                            .astype(np.uint8)
                        )
                raise ValueError("no frame decoded")

        return duration, frame_at
    return None


class ImageDecode:
    """Actor-pool stage: binary payload → fixed-size RGB tensor + stats.

    Use as ``ds.map_batches(ImageDecode, fn_constructor_kwargs=...,
    concurrency=N, batch_size=small, num_cpus=1)`` — payloads are MBs,
    so batch_size × concurrency must be sized to worker heaps
    (SURVEY.md §4.2 memory row).
    """

    def __init__(self, height: int = 32, width: int = 32, decoder: str = "strict"):
        # per-actor setup: codec import/selection happens once here
        self.h, self.w = height, width
        self.decoder = decoder
        self.codec = _load_image_codec() if decoder == "strict" else None

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            return _fake_pixels(payload, self.h, self.w)
        if self.codec is not None:
            return self.codec(payload, self.h, self.w)
        raise NotImplementedError(
            "image codecs (PIL) are not available in this environment; "
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
        self.codec = _load_video_codec() if decoder == "strict" else None

    def _duration_sec(self, payload: bytes) -> float:
        if self.decoder == "fake":
            seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
            return 1.0 + (seed % 600_000) / 1000.0  # 1..601 s, deterministic
        if self.codec is not None:
            return self.codec[0](payload)
        raise NotImplementedError(
            "video codecs (decord/av) are not available in this environment; "
            "run with decoder='fake' for plumbing tests"
        )

    def _frame(self, payload: bytes, k: int, t: float) -> np.ndarray:
        if self.codec is not None:
            return self.codec[1](payload, t, self.h, self.w)
        return _fake_pixels(payload + k.to_bytes(4, "big"), self.h, self.w)

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
                tensors.append(self._frame(p, k, t))
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
        self.codec = _load_audio_codec() if decoder == "strict" else None

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
            rng = np.random.Generator(np.random.PCG64(seed))
            return rng.standard_normal((self.frames, self.feat_dim))
        if self.codec is not None:
            return self.codec(payload, self.frames, self.feat_dim)
        raise NotImplementedError(
            "audio codecs (soundfile) are not available in this environment; "
            "run with decoder='fake' for plumbing tests"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p) for p in batch["payload"].to_pylist()]
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
