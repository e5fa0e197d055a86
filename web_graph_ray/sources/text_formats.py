"""JSONL / CSV interchange: the corpus exchange formats around Parquet.

LLM training corpora move as newline-delimited JSON (one document per
line) and occasionally CSV; the reference ingests from Postgres only
(pkg/linkstorage/linkstorage.go), so this module is new surface.  Both
directions stay distributed: ``ray.data``'s native readers/writers emit
one file per block (never one giant file), so a 100 TB corpus reads and
writes as parallel shards with the streaming executor's backpressure.

Fidelity notes:
- JSONL round-trips strings exactly (JSON escapes newlines, quotes and
  non-BMP codepoints inside documents) — the safe format for `text`.
- CSV round-trips numerics; timestamps/embedded newlines need quoting
  rules pinned, so prefer JSONL for text-bearing tables.
"""

from __future__ import annotations

import os
import shutil

import ray
import ray.data

__all__ = [
    "write_jsonl", "read_jsonl", "write_jsonl_gz", "read_jsonl_gz",
    "write_csv", "read_csv",
    "write_ipc", "read_ipc", "write_tfrecord", "read_tfrecord", "crc32c",
]


def write_jsonl(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as newline-delimited JSON, one ``.json`` shard per
    block (Ray Data's write_json is JSONL: pandas ``to_json(orient=
    "records", lines=True)`` per block).  ``clean`` removes a previous
    run's directory first so re-runs are idempotent."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ds.write_json(out_dir)
    return out_dir


def read_jsonl(path: str, **kwargs) -> "ray.data.Dataset":
    """Read newline-delimited JSON shards (pyarrow ``read_json`` per
    file — parallel across files, Arrow-native blocks)."""
    return ray.data.read_json(path, **kwargs)


def write_jsonl_gz(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as gzip-compressed JSONL shards (``.jsonl.gz``) —
    how public web corpora actually ship (C4 / OSCAR / Common Crawl WET
    derivatives are one gzip member per shard).  One shard per block;
    rows serialize with the same pandas JSON-lines escaping as
    ``write_jsonl``; the gzip header carries a zeroed mtime and no
    filename so shard bytes are a pure function of content, and shards
    are content-hash-named + written tmp+rename — re-runs are
    idempotent and a crash never leaves a torn file."""
    import gzip
    import hashlib

    import pyarrow as pa

    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def w(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            # an empty block (e.g. a filter that drained it) must not
            # produce a zero-byte shard: pyarrow's JSON reader rejects
            # an empty decompressed stream, breaking the roundtrip
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        raw = t.to_pandas().to_json(orient="records", lines=True).encode()
        buf = gzip.compress(raw, mtime=0)
        final = os.path.join(out_dir, f"{hashlib.sha1(buf).hexdigest()[:24]}.jsonl.gz")
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(buf)
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]), "rows": pa.array([len(t)])})

    ds.map_batches(w, batch_format="pyarrow").materialize()
    return out_dir


def read_jsonl_gz(path: str, **kwargs) -> "ray.data.Dataset":
    """Read ``.jsonl.gz`` shards: Ray's JSON datasource with a
    gzip-decompressing open stream — each file inflates inside its own
    read task (parallel across shards, streaming within one)."""
    return ray.data.read_json(
        path,
        arrow_open_stream_args={"compression": "gzip"},
        file_extensions=["gz"],
        **kwargs,
    )


def write_csv(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as CSV, one shard per block."""
    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    ds.write_csv(out_dir)
    return out_dir


def read_csv(path: str, **kwargs) -> "ray.data.Dataset":
    """Read CSV shards (pyarrow CSV reader per file)."""
    return ray.data.read_csv(path, **kwargs)


def write_ipc(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as Arrow IPC (Feather V2) shards, one ``.arrow``
    file per block — the zero-copy interchange format between Arrow
    runtimes.  Shard names are content hashes (SHA-1 of the serialized
    stream), written tmp+rename, so re-runs are idempotent and a
    partial failure never leaves a torn file."""
    import hashlib

    import pyarrow as pa
    import pyarrow.feather as feather

    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def w(t: "pa.Table") -> "pa.Table":
        sink = pa.BufferOutputStream()
        feather.write_feather(t, sink, compression="uncompressed")
        buf = sink.getvalue()
        name = hashlib.sha1(buf.to_pybytes()).hexdigest()[:24]
        final = os.path.join(out_dir, f"{name}.arrow")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(buf.to_pybytes())
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]), "rows": pa.array([len(t)])})

    ds.map_batches(w, batch_format="pyarrow").materialize()
    return out_dir


def read_ipc(path: str) -> "ray.data.Dataset":
    """Read Arrow IPC shards back as a Dataset: the shard list fans out
    as items, each task deserializes its files with the Feather reader
    (zero-copy into Arrow blocks)."""
    import pyarrow as pa
    import pyarrow.feather as feather

    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".arrow")
    )

    def rd(batch: "pa.Table") -> "pa.Table":
        tables = [feather.read_table(f) for f in batch["item"].to_pylist()]
        return pa.concat_tables(tables)

    return ray.data.from_items(files).map_batches(rd, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TFRecord (tf.train.Example) — the training-data container format
# ---------------------------------------------------------------------------
#
# Pure-stdlib implementation of BOTH layers of the format so corpora can
# be handed to (or taken from) TF/JAX input pipelines without TensorFlow
# in this environment:
#
#   framing   per record: uint64-LE length, masked-CRC32C(length bytes),
#             payload, masked-CRC32C(payload)   (tensorflow/core/lib/io/
#             record_writer.cc — public format spec)
#   payload   a hand-encoded `tf.train.Example` protobuf: Features =
#             map<string, Feature>, Feature = oneof {BytesList(1),
#             FloatList(2, packed float32), Int64List(3, packed varint)}
#
# Column mapping: string/binary → bytes feature; integer → int64 feature;
# float → float feature (float32 — TF's FloatList is 32-bit, so doubles
# lose precision by FORMAT DESIGN; keep exact values in int features).
# CRC32C here is a table-driven pure-Python loop (no crc32c wheel in
# this container) — linear, per-shard-parallel; a deployment would swap
# in a native crc32c with identical output.

_CRC32C_POLY = 0x82F63B78


def _crc32c_table() -> list[int]:
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_CRC32C_POLY if c & 1 else 0)
        tab.append(c)
    return tab


_CRC32C_TAB = _crc32c_table()


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), the checksum TFRecord framing mandates.
    Verified against the RFC 3720 test vector in tests."""
    crc = 0xFFFFFFFF
    tab = _CRC32C_TAB
    for b in data:
        crc = (crc >> 8) ^ tab[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited protobuf field (wire type 2)."""
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_feature(kind: str, value) -> bytes:
    import struct

    if value is None:
        # a null cell becomes a present-but-EMPTY typed list (zero
        # values) — tf.train.Example has no null; the empty list is the
        # canonical sparse representation, keeps every Example carrying
        # one feature per column (reader alignment), and is
        # distinguishable from an empty string (a 1-element BytesList
        # whose value has length 0).  read_tfrecord decodes it to null.
        field = {"bytes": 1, "float": 2, "int64": 3}[kind]
        return _ld(field, b"")
    if kind == "bytes":
        inner = _ld(1, value)                      # BytesList.value
        return _ld(1, inner)                       # Feature.bytes_list
    if kind == "float":
        packed = struct.pack("<f", float(value))   # FloatList packed
        inner = _ld(1, packed)
        return _ld(2, inner)                       # Feature.float_list
    # int64: varint, two's-complement 64-bit for negatives
    packed = _varint(int(value) & 0xFFFFFFFFFFFFFFFF)
    inner = _ld(1, packed)                         # Int64List.value packed
    return _ld(3, inner)                           # Feature.int64_list


def _example_bytes(keys: list[tuple[str, str, bytes]], row: tuple) -> bytes:
    feats = bytearray()
    for (name, kind, name_b), v in zip(keys, row):
        entry = _ld(1, name_b) + _ld(2, _encode_feature(kind, v))
        feats += _ld(1, entry)                     # Features.feature entry
    return _ld(1, bytes(feats))                    # Example.features


def write_tfrecord(ds: "ray.data.Dataset", out_dir: str, clean: bool = True) -> str:
    """Write ``ds`` as TFRecord shards of tf.train.Example records, one
    ``.tfrecord`` file per block (content-hashed name, tmp+rename —
    idempotent re-runs, never a torn shard).  Feature kinds derive from
    the Arrow schema; see the module note on float32 semantics."""
    import hashlib

    import pyarrow as pa

    if clean and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def w(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        keys = []
        cols = []
        for f in t.schema:
            if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
                kind = "bytes"
                cols.append([
                    s.encode() if s is not None else None
                    for s in t[f.name].to_pylist()
                ])
            elif pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type):
                kind = "bytes"
                cols.append(t[f.name].to_pylist())
            elif pa.types.is_integer(f.type):
                kind = "int64"
                cols.append(t[f.name].to_pylist())
            elif pa.types.is_floating(f.type):
                kind = "float"
                cols.append(t[f.name].to_pylist())
            else:
                raise TypeError(
                    f"write_tfrecord: unsupported column type {f.type} "
                    f"({f.name}) — cast or drop it first"
                )
            keys.append((f.name, kind, f.name.encode()))
        buf = bytearray()
        for row in zip(*cols):
            payload = _example_bytes(keys, row)
            ln = len(payload).to_bytes(8, "little")
            buf += ln
            buf += _masked_crc(ln).to_bytes(4, "little")
            buf += payload
            buf += _masked_crc(payload).to_bytes(4, "little")
        data = bytes(buf)
        name = hashlib.sha1(data).hexdigest()[:24]
        final = os.path.join(out_dir, f"{name}.tfrecord")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, final)
        return pa.table({"file": pa.array([final]), "rows": pa.array([t.num_rows])})

    ds.map_batches(w, batch_format="pyarrow").materialize()
    return out_dir


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        x = b[i]
        i += 1
        n |= (x & 0x7F) << shift
        if not x & 0x80:
            return n, i
        shift += 7


def _parse_example(payload: bytes) -> dict:
    """Decode a tf.train.Example back to {name: (kind, value)}."""
    import struct

    out = {}
    tag, i = _read_varint(payload, 0)              # Example.features
    ln, i = _read_varint(payload, i)
    feats = payload[i : i + ln]
    j = 0
    while j < len(feats):
        _tag, j = _read_varint(feats, j)           # Features.feature entry
        eln, j = _read_varint(feats, j)
        entry = feats[j : j + eln]
        j += eln
        k = 0
        name = b""
        kind, val = None, None
        while k < len(entry):
            etag, k = _read_varint(entry, k)
            fln, k = _read_varint(entry, k)
            body = entry[k : k + fln]
            k += fln
            if etag >> 3 == 1:                     # key
                name = body
            else:                                  # value: Feature
                ftag, m = _read_varint(body, 0)
                lln, m = _read_varint(body, m)
                lst = body[m : m + lln]
                fk = ftag >> 3
                if not lst:                        # empty list ⇒ null cell
                    kind = {1: "bytes", 2: "float", 3: "int64"}[fk]
                    val = None
                elif fk == 1:                      # BytesList
                    _vt, p = _read_varint(lst, 0)
                    vln, p = _read_varint(lst, p)
                    kind, val = "bytes", lst[p : p + vln]
                elif fk == 2:                      # FloatList (packed)
                    _vt, p = _read_varint(lst, 0)
                    vln, p = _read_varint(lst, p)
                    kind, val = "float", struct.unpack("<f", lst[p : p + 4])[0]
                else:                              # Int64List (packed)
                    _vt, p = _read_varint(lst, 0)
                    vln, p = _read_varint(lst, p)
                    raw, _ = _read_varint(lst, p)
                    if raw >= 1 << 63:
                        raw -= 1 << 64
                    kind, val = "int64", raw
        out[name.decode()] = (kind, val)
    return out


def read_tfrecord(path: str) -> "ray.data.Dataset":
    """Read TFRecord shards of tf.train.Example back into a Dataset —
    shard list fans out as items; each task walks its files' framing
    (verifying BOTH masked CRCs — a torn or bit-flipped shard raises
    instead of yielding silent garbage) and decodes Examples into
    Arrow columns."""
    import pyarrow as pa

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".tfrecord")
    )

    def rd(batch: "pa.Table") -> "pa.Table":
        cols: dict[str, list] = {}
        kinds: dict[str, str] = {}
        for fp in batch["item"].to_pylist():
            with open(fp, "rb") as f:
                data = f.read()
            i = 0
            while i < len(data):
                ln_b = data[i : i + 8]
                i += 8
                ln_crc = int.from_bytes(data[i : i + 4], "little")
                i += 4
                if _masked_crc(ln_b) != ln_crc:
                    raise IOError(f"tfrecord length CRC mismatch in {fp}")
                ln = int.from_bytes(ln_b, "little")
                payload = data[i : i + ln]
                i += ln
                p_crc = int.from_bytes(data[i : i + 4], "little")
                i += 4
                if _masked_crc(payload) != p_crc:
                    raise IOError(f"tfrecord payload CRC mismatch in {fp}")
                ex = _parse_example(payload)
                for name, (kind, val) in ex.items():
                    cols.setdefault(name, []).append(val)
                    kinds[name] = kind
        arrays = {}
        for name, vals in cols.items():
            if kinds[name] == "bytes":
                arrays[name] = pa.array(vals, pa.binary())
            elif kinds[name] == "float":
                arrays[name] = pa.array(vals, pa.float32())
            else:
                arrays[name] = pa.array(vals, pa.int64())
        return pa.table(arrays)

    return ray.data.from_items(files).map_batches(rd, batch_format="pyarrow")
