"""Multimodal (image/audio/video) stages — Ray-side plumbing, tiered codecs.

Design for opaque ``binary`` payload columns with typed metadata
(mime/width/height/duration).  The codec boundary is resolved
opportunistically once per actor, in THREE tiers:

- real wheels when importable (PIL for images, soundfile for audio,
  decord/av for video);
- a stdlib tier when they are not: a pure numpy+zlib PNG decoder
  (8-bit gray/RGB/palette/alpha, non-interlaced, all five scanline
  filters, nearest-neighbor resize), a ``wave``-module WAV decoder
  feeding the same spectral-feature kernel, and a RIFF parser for
  uncompressed-DIB AVI video (header-only chunk scan, per-frame DIB →
  RGB) — so strict mode REALLY decodes PNG/WAV/AVI fixtures even in a
  wheel-less container; other formats raise with an install hint;
- ``decoder="fake"`` produces deterministic pseudo-decodes derived
  from the payload bytes, so the Ray-side plumbing (schemas, batch
  sizing, actor-pool shape, output layout) is exercised without any
  decodable payloads.

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


# -- stdlib decoders (tier 2: no wheels, real decode) ------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_to_rgb(payload: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode → (H, W, 3) uint8.  Supports the
    common baseline: 8-bit depth, color types 0/2/3/4/6, non-interlaced,
    all five scanline filters (the serial Sub/Average/Paeth recursions
    run per-byte — fixture-scale images, not a throughput path)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise NotImplementedError(
            "stdlib image tier decodes PNG only (payload has no PNG signature); "
            "install PIL for other formats or run with decoder='fake'"
        )
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError(f"stdlib PNG tier: unsupported depth={depth}/interlace={interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if len(raw) != (stride + 1) * h:
        raise ValueError("malformed PNG: scanline size mismatch")
    raw = raw.reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    for y in range(h):
        f, rec = int(ftypes[y]), rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b, c = prev[x], (prev[x - bpp] if x >= bpp else 0)
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"malformed PNG: filter type {f}")
        out[y] = rec
    img = out.astype(np.uint8).reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(img, 3, axis=2)
    if ctype == 2:
        return img
    if ctype == 3:
        if plte is None:
            raise ValueError("malformed PNG: palette image without PLTE")
        return np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)[img[..., 0]]
    if ctype == 4:
        return np.repeat(img[..., :1], 3, axis=2)
    return np.ascontiguousarray(img[..., :3])  # 6: drop alpha


def _resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pixel-center sampling)."""
    ih, iw = img.shape[:2]
    ys = np.minimum(((np.arange(h) + 0.5) * ih / h).astype(np.int64), ih - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * iw / w).astype(np.int64), iw - 1)
    return img[ys][:, xs]


def _wav_to_float(payload: bytes) -> np.ndarray:
    """stdlib ``wave`` decode → mono float32 in [-1, 1)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, sw = wf.getnchannels(), wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as exc:
        raise NotImplementedError(
            "stdlib audio tier decodes WAV only; install soundfile for "
            "other formats or run with decoder='fake'"
        ) from exc
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"stdlib WAV tier: unsupported sample width {sw}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x


def _avi_meta(payload: bytes):
    """Parse a RIFF/AVI container (uncompressed-DIB video stream) into
    (fps, frame_chunks, width, height) where ``frame_chunks`` is a list
    of (offset, size) into ``payload`` — one per '00db'/'00dc' chunk in
    the movi list.  Header-only scan: no pixel data is touched, so
    duration probes are O(chunks).  Encoder twin:
    sources/synth.encode_avi_dib."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise NotImplementedError(
            "stdlib video tier decodes uncompressed-DIB AVI only; install "
            "decord/av for other formats or run with decoder='fake'"
        )

    fps, w, h, bitcount, compression = None, None, None, None, None
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal fps, w, h, bitcount, compression
        while pos + 8 <= end:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif fourcc == b"strh" and payload[body : body + 4] == b"vids":
                scale, rate = struct.unpack("<II", payload[body + 20 : body + 28])
                fps = rate / scale if scale else 30.0
            elif fourcc == b"strf" and w is None:
                _, bw, bh, _, bc, comp = struct.unpack(
                    "<IiiHHI", payload[body : body + 20]
                )
                w, h, bitcount, compression = bw, abs(bh), bc, comp
            elif fourcc[2:4] in (b"db", b"dc"):
                frames.append((body, size))
            pos = body + size + (size % 2)  # chunks are word-aligned

    walk(12, len(payload))
    if not frames or w is None:
        raise ValueError("stdlib AVI tier: no video frames found")
    if compression != 0 or bitcount != 24:
        raise NotImplementedError(
            "stdlib video tier reads BI_RGB 24-bit DIB frames only "
            f"(got compression={compression}, bitcount={bitcount})"
        )
    return (fps or 30.0), frames, w, h


def _avi_frame_rgb(payload: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` of an uncompressed AVI → (H, W, 3) uint8 RGB
    (undoes the DIB layout: bottom-up rows, BGR, 4-byte row padding)."""
    fps, frames, w, h = _avi_meta(payload)
    off, size = frames[min(max(idx, 0), len(frames) - 1)]
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
    bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


def _spectral_features(wav: np.ndarray, frames: int, feat_dim: int) -> np.ndarray:
    """Frame-sampled log-magnitude spectrum features: ``frames`` equal
    windows, first ``feat_dim`` rFFT bins each (numpy-only MFCC
    stand-in) — shared by the soundfile and stdlib-WAV tiers."""
    n = max(len(wav) // frames, 1)
    out = np.zeros((frames, feat_dim), dtype=np.float64)
    for i in range(frames):
        win = wav[i * n : (i + 1) * n]
        if len(win):
            spec = np.abs(np.fft.rfft(win, n=max(2 * feat_dim, len(win))))
            out[i] = np.log1p(spec[:feat_dim])
    return out


# -- opportunistic codec loaders -------------------------------------------
# Each returns (tier_name, decode_callable); the stdlib tier is always
# available for images/audio, so strict mode really decodes PNG/WAV in a
# wheel-less container.  Called once per actor in __init__ (never per
# batch/row), so a worker pays the import exactly once and the selection
# is visible in the actor's state for tests to assert on.

def _load_image_codec():
    try:
        import io

        from PIL import Image

        def decode(payload: bytes, h: int, w: int) -> np.ndarray:
            img = Image.open(io.BytesIO(payload)).convert("RGB").resize((w, h))
            return np.asarray(img, dtype=np.uint8)

        return ("pil", decode)
    except ImportError:
        pass

    def decode(payload: bytes, h: int, w: int) -> np.ndarray:
        return _resize_nearest(_png_to_rgb(payload), h, w)

    return ("stdlib-png", decode)


def _load_audio_codec():
    try:
        import io

        import soundfile

        def decode(payload: bytes, frames: int, feat_dim: int) -> np.ndarray:
            wav, _sr = soundfile.read(io.BytesIO(payload), dtype="float32")
            if wav.ndim > 1:
                wav = wav.mean(axis=1)
            return _spectral_features(wav, frames, feat_dim)

        return ("soundfile", decode)
    except ImportError:
        pass

    def decode(payload: bytes, frames: int, feat_dim: int) -> np.ndarray:
        return _spectral_features(_wav_to_float(payload), frames, feat_dim)

    return ("stdlib-wav", decode)


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

    # tier 2 (no wheels): stdlib RIFF parser for uncompressed-DIB AVI —
    # real container parse + real pixel decode, same seam as the
    # PNG/WAV stdlib tiers.  Other formats raise NotImplementedError
    # with an install hint (the honest-stub contract).
    def duration(payload: bytes) -> float:
        fps, frames, _, _ = _avi_meta(payload)
        return len(frames) / fps

    def frame_at(payload: bytes, t: float, h: int, w: int) -> np.ndarray:
        fps, frames, _, _ = _avi_meta(payload)
        idx = min(int(t * fps), len(frames) - 1)
        return _resize_nearest(_avi_frame_rgb(payload, idx), h, w)

    return duration, frame_at


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
        self.codec_tier, self.codec = (
            _load_image_codec() if decoder == "strict" else (None, None)
        )

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            return _fake_pixels(payload, self.h, self.w)
        # strict: the stdlib-png tier guarantees a codec; non-PNG payloads
        # without PIL raise NotImplementedError inside the decode
        return self.codec(payload, self.h, self.w)

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
        self.codec_tier, self.codec = (
            _load_audio_codec() if decoder == "strict" else (None, None)
        )

    def _features(self, payload: bytes) -> np.ndarray:
        if self.decoder == "fake":
            seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
            rng = np.random.Generator(np.random.PCG64(seed))
            return rng.standard_normal((self.frames, self.feat_dim))
        # strict: the stdlib-wav tier guarantees a codec; non-WAV payloads
        # without soundfile raise NotImplementedError inside the decode
        return self.codec(payload, self.frames, self.feat_dim)

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
