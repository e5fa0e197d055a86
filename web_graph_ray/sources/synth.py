"""Deterministic synthetic Common-Crawl-style page corpus.

Generates the engine's primary input table (BASELINE.json input_hint):

    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string
    (+ content_type:string — needed by the F4 response gate,
       ``pkg/linkutils/linkutils.go:53-63``; absent column ⇒ text/html)

The HTML of every page embeds a known link graph with all the
adversarial cases from FIXTURES.md §1 (identity collisions, filtered
schemes/hosts/extensions, relative links, anchor edge cases, invalid
UTF-8, dead links, non-HTML targets, a mega-host holding ~30% of
pages, a deep chain, cycles/self-links, robots.txt rules).

The ``text`` column is computed ANALYTICALLY during HTML construction
(not by running the extractor), so the engine-vs-corpus text
comparison is a real parity check, byte for byte.

Everything is a pure function of (page index, config) — no global
state — so corpus generation itself can run inside Ray
``map_batches`` at bench scale.
"""

from __future__ import annotations

import html as html_mod
from dataclasses import dataclass

import pyarrow as pa

__all__ = [
    "CorpusConfig", "page_url", "render_page", "render_pages_table",
    "seed_urls", "write_corpus", "encode_png_rgb", "encode_wav_mono",
]

_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)

_LANGS = ("en", "de", "fr", "es", "it")


@dataclass(frozen=True)
class CorpusConfig:
    n_pages: int = 1000
    seed: int = 42
    n_hosts: int = 20  # "normal" hosts, in addition to mega + chain hosts
    chain_len: int = 15  # deep-chain length (depth > 10 per FIXTURES)
    avg_links: int = 5  # baseline random outlinks per page

    mega_host: str = "mega.example.com"
    chain_host: str = "chain.example.com"
    dead_host: str = "dead.example.net"  # linked but never in corpus

    #: extra filler prose per page (bench knob: makes html realistically
    #: heavy so extract is compute-bound; 0 keeps unit fixtures tiny)
    filler_words: int = 0

    @property
    def n_chain(self) -> int:
        return min(self.chain_len, self.n_pages)


_MASK64 = 0xFFFFFFFFFFFFFFFF


def _mix(cfg: CorpusConfig, *xs: int) -> int:
    """Deterministic pseudo-random int from the config seed + keys
    (splitmix64-style finalizer; seed-stable across processes)."""
    h = (cfg.seed * 0x9E3779B97F4A7C15 + 0xD1B54A32D192ED03) & _MASK64
    for x in xs:
        h = (h ^ (x + 0x9E3779B9)) * 0xBF58476D1CE4E5B9 & _MASK64
        h = (h ^ (h >> 31)) & _MASK64
    return h


def _host_of(cfg: CorpusConfig, i: int) -> str:
    if i < cfg.n_chain:
        return cfg.chain_host
    if i % 10 < 3:  # ~30% of pages on the mega host (skew case)
        return cfg.mega_host
    return f"host{_mix(cfg, i, 1) % cfg.n_hosts:02d}.example.org"


def _path_of(cfg: CorpusConfig, i: int) -> str:
    if i < cfg.n_chain:
        return f"/c{i}.html"
    style = _mix(cfg, i, 2) % 4
    if style == 0:
        return f"/p{i}.html"
    if style == 1:
        return f"/articles/a{i}.htm"
    if style == 2:
        return f"/dir{i % 7}/page{i}"
    return f"/p{i}"


def page_url(cfg: CorpusConfig, i: int) -> str:
    scheme = "https" if _mix(cfg, i, 3) % 4 else "http"
    return f"{scheme}://{_host_of(cfg, i)}{_path_of(cfg, i)}"


def _targets_of(cfg: CorpusConfig, i: int) -> list[int]:
    """Baseline random outlink target indices (graph topology)."""
    n = cfg.n_pages
    k = 1 + _mix(cfg, i, 4) % (2 * cfg.avg_links)
    out = []
    lo = cfg.n_chain  # random links never target chain pages, keeping the
    for j in range(k):  # deep chain genuinely deep (depth = chain position)
        out.append(lo + _mix(cfg, i, 5, j) % max(1, n - lo))
    if i < cfg.n_chain - 1:
        out.insert(0, i + 1)  # the deep chain
    if i % 47 == 0 and i >= cfg.n_chain:
        out.append(i)  # self-link
    if i % 53 == 0 and i >= cfg.n_chain:
        out.append(i - 1)  # short cycle A→B→A
    return out


def _is_nonhtml(cfg: CorpusConfig, i: int) -> bool:
    """Pages present in the corpus but with a non-HTML content type."""
    return i % 37 == 5 and i >= cfg.n_chain


def render_page(cfg: CorpusConfig, i: int) -> dict:
    """Render page i → one corpus row. Pure and deterministic."""
    url = page_url(cfg, i)
    host = _host_of(cfg, i)

    # --- assemble anchors: list of (href, anchor_inner_html, anchor_text)
    # anchor_text is the DECODED text (what goquery Text() yields);
    # None text means the anchor contributes exactly its inner literal.
    anchors: list[tuple[str, str, str]] = []

    for j, t in enumerate(_targets_of(cfg, i)):
        t_url = page_url(cfg, t)
        label = f"link {i}-{j} to {t}"
        style = _mix(cfg, i, 6, j) % 5
        if style == 0:
            # relative same-host form when target shares our host
            if _host_of(cfg, t) == host:
                href = _path_of(cfg, t)  # absolute-path reference
            else:
                href = t_url
        elif style == 1:
            href = "//" + _host_of(cfg, t) + _path_of(cfg, t)  # protocol-relative
        else:
            href = t_url
        anchors.append((href, html_mod.escape(label), label))

    m = _mix(cfg, i, 7) % 100
    # Adversarial extras are kept off the chain pages so the deep chain
    # stays a pure depth ladder.
    adv = i >= cfg.n_chain
    # identity-collision variants of an existing page
    if adv and i % 13 == 0:
        t = cfg.n_chain + _mix(cfg, i, 8) % max(1, cfg.n_pages - cfg.n_chain)
        base = page_url(cfg, t)
        variant = (
            base.replace("https://", "http://", 1)
            if base.startswith("https://")
            else base.replace("http://", "https://", 1)
        )
        anchors.append((variant + "?utm=1#frag", "variant twin", "variant twin"))
    # filtered schemes
    if adv and i % 17 == 0:
        anchors.append(("mailto:someone@example.com", "mail me", "mail me"))
        anchors.append(("javascript:void(0)", "js", "js"))
        anchors.append(("ftp://files.example.com/f", "ftp", "ftp"))
    # blocked hosts
    if adv and i % 19 == 0:
        anchors.append(("https://t.co/abc123", "short", "short"))
        anchors.append(("https://pbs.twimg.com/img1", "img", "img"))
    # bad extensions
    if adv and i % 23 == 0:
        anchors.append(("/files/doc.pdf", "a pdf", "a pdf"))
        anchors.append(("/style/site.css", "css", "css"))
    # relative-link forms against our own URL
    if adv and i % 29 == 0:
        anchors.append(("../up", "up", "up"))
        anchors.append(("./here", "here", "here"))
        anchors.append(("?q=2", "requery", "requery"))
        anchors.append(("#frag", "fragment", "fragment"))
    # dead link (host absent from corpus)
    if adv and i % 31 == 0:
        anchors.append((f"https://{cfg.dead_host}/p{i}", "dead end", "dead end"))
    # link to a non-HTML corpus page
    if adv and i % 37 == 0 and i + 5 < cfg.n_pages:
        anchors.append((page_url(cfg, i + 5), "binary blob", "binary blob"))

    # --- build html + analytic text in lockstep (no inter-tag whitespace)
    title = f"Page {i} of {host}"
    heading = f"Welcome to page {i}"
    html_parts = [f"<html><head><title>{html_mod.escape(title)}</title></head><body>"]
    text_parts = [title]
    html_parts.append(f"<h1>{html_mod.escape(heading)}</h1>")
    text_parts.append(heading)

    for href, inner, text in anchors:
        html_parts.append(f'<p><a href="{html_mod.escape(href, quote=True)}">{inner}</a></p>')
        text_parts.append(text)

    # anchor edge cases (FIXTURES §1.4)
    if adv and i % 41 == 0:
        html_parts.append('<p><a name="no-href">no href here</a></p>')
        text_parts.append("no href here")
        html_parts.append(f'<p><a href="  {_path_of(cfg, (i * 3 + 1) % cfg.n_pages)}  ">padded href</a></p>')
        text_parts.append("padded href")
        html_parts.append('<p><a href="/nested">Nested <b>bold <i>deep</i></b> text</a></p>')
        text_parts.append("Nested bold deep text")
        html_parts.append('<p><a href="http://bad host/">unparseable</a></p>')
        text_parts.append("unparseable")
        # duplicate (from,to) with different anchor text — first text wins
        dup = _path_of(cfg, (i * 5 + 2) % cfg.n_pages)
        html_parts.append(f'<p><a href="{dup}">first text</a><a href="{dup}">second text</a></p>')
        text_parts.append("first text")
        text_parts.append("second text")
    if i % 59 == 0:
        html_parts.append("<p>unicode snippet: café ✓ straße</p>")
        text_parts.append("unicode snippet: café ✓ straße")
    filler = f"Filler prose for page {i}: " + " ".join(
        f"w{_mix(cfg, i, 9, j) % 1000}" for j in range(10 + m % 20 + cfg.filler_words)
    )
    html_parts.append(f"<p>{filler}</p></body></html>")
    text_parts.append(filler)

    html_bytes = "".join(html_parts).encode("utf-8")
    text = "".join(text_parts)

    # invalid UTF-8 anchor text (engine must DELETE the bad byte, like
    # Go's strings.ToValidUTF8(s, "") at pkg/linkstorage/linkstorage.go:408)
    if adv and i % 43 == 0:
        extra = (
            f'<p><a href="/x{i}.html">bad'.encode()
            + b"\xff"
            + f"byte{i}marker</a></p></body></html>".encode()
        )
        html_bytes = html_bytes.replace(b"</body></html>", extra)
        text = text + f"badbyte{i}marker"

    return {
        "url": url,
        "warc_ts": _EPOCH_US + i * 1_000_000,
        "html": html_bytes,
        "text": text,
        "lang": _LANGS[_mix(cfg, i, 10) % len(_LANGS)],
        "content_type": (
            "application/pdf" if _is_nonhtml(cfg, i) else
            ("application/xhtml+xml;charset=utf-8" if i % 11 == 7 else "text/html; charset=utf-8")
        ),
    }


def _robots_rows(cfg: CorpusConfig) -> list[dict]:
    """robots.txt rows for two hosts (politeness/robots extension input)."""
    rows = []
    for host, body in (
        (cfg.mega_host, "User-agent: *\nDisallow: /dir1/\nDisallow: /private/\n"),
        (cfg.chain_host, "User-agent: *\nDisallow: /c9.html\n"),
    ):
        rows.append(
            {
                "url": f"https://{host}/robots.txt",
                "warc_ts": _EPOCH_US - 1_000_000,
                "html": body.encode(),
                "text": body,
                "lang": "en",
                "content_type": "text/plain",
            }
        )
    return rows


_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("content_type", pa.string()),
    ]
)


def render_pages_table(cfg: CorpusConfig, start: int = 0, stop: int | None = None) -> pa.Table:
    """Render rows [start, stop) (plus robots rows when start == 0)."""
    stop = cfg.n_pages if stop is None else stop
    rows = [render_page(cfg, i) for i in range(start, stop)]
    if start == 0:
        rows = _robots_rows(cfg) + rows
    cols = {name: [r[name] for r in rows] for name in _SCHEMA.names}
    cols["warc_ts"] = pa.array(cols["warc_ts"], type=pa.timestamp("us"))
    return pa.Table.from_pydict(cols, schema=_SCHEMA)


def seed_urls(cfg: CorpusConfig) -> list[str]:
    """Deterministic seed list (mirrors cmd/link-processor/main.go:56-82's
    ordered hard-coded list): chain start, mega root, a few normal pages,
    one page_id-colliding seed pair, one dead seed."""
    seeds = [page_url(cfg, 0)]  # chain start
    mega = [i for i in range(cfg.n_chain, min(cfg.n_pages, cfg.n_chain + 60)) if _host_of(cfg, i) == cfg.mega_host]
    if mega:
        seeds.append(page_url(cfg, mega[0]))
    step = max(1, cfg.n_pages // 7)
    for i in range(cfg.n_chain, cfg.n_pages, step):
        seeds.append(page_url(cfg, i))
    # colliding pair: scheme/port/query variant of the FIRST seed
    first = seeds[0]
    variant = first.replace("https://", "http://", 1) if first.startswith("https://") else first.replace("http://", "https://", 1)
    seeds.append(variant + "?utm=seed")
    seeds.append(f"https://{cfg.dead_host}/seed")  # dead seed
    return seeds


def write_corpus_ray(out_dir: str, cfg: CorpusConfig, shard_rows: int = 8192) -> str:
    """Bench-scale corpus generation: render pages INSIDE Ray map_batches
    (generation is a pure function of the row index) and write a
    multi-file parquet dataset.  Robots rows ride with shard 0."""
    import os

    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir

    def render(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        rows = [render_page(cfg, i) for i in ids]
        if 0 in ids:  # robots rows ride with the shard containing page 0
            rows = _robots_rows(cfg) + rows
        cols = {name: [r[name] for r in rows] for name in _SCHEMA.names}
        cols["warc_ts"] = pa.array(cols["warc_ts"], type=pa.timestamp("us"))
        return pa.Table.from_pydict(cols, schema=_SCHEMA)

    (
        ray.data.range(cfg.n_pages, override_num_blocks=max(1, cfg.n_pages // shard_rows))
        .map_batches(render, batch_format="pyarrow", batch_size=shard_rows)
        .write_parquet(out_dir)
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def write_corpus(out_dir: str, cfg: CorpusConfig, row_group_size: int = 4096) -> str:
    """Write the corpus to ``{out_dir}/pages.parquet`` (single node path;
    bench-scale generation goes through Ray map_batches instead)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "pages.parquet")
    pq.write_table(render_pages_table(cfg), path, row_group_size=row_group_size)
    return path


# -- deterministic multimodal fixture payloads --------------------------------
# Minimal REAL containers (baseline PNG / PCM WAV) so the strict-mode
# stdlib codec tier (stages/multimodal.py) is exercisable end-to-end in a
# wheel-less environment; both are pure functions of their inputs.


def encode_png_rgb(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 array as a baseline PNG (8-bit RGB,
    filter 0 per scanline, non-interlaced, one IDAT)."""
    import struct
    import zlib

    import numpy as np

    h, w = pixels.shape[:2]
    raw = bytearray()
    flat = np.asarray(pixels, dtype=np.uint8).reshape(h, w * 3)
    for y in range(h):
        raw.append(0)
        raw.extend(flat[y].tobytes())

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_wav_mono(samples, framerate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] as 16-bit mono PCM WAV."""
    import io
    import wave

    import numpy as np

    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(
            (np.clip(np.asarray(samples), -1.0, 1.0) * 32767).astype("<i2").tobytes()
        )
    return bio.getvalue()


def encode_avi_dib(frames, fps: int = 10) -> bytes:
    """Encode an (n, h, w, 3) uint8 RGB array as a minimal uncompressed
    AVI (RIFF 'AVI ' / hdrl(avih + strl(strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER BI_RGB)) / movi with one '00db' DIB chunk per
    frame).  DIB frames are bottom-up BGR rows padded to 4 bytes — the
    on-disk layout every AVI reader expects.  Pure struct packing, no
    codec: the matching stdlib decode tier lives in
    stages/multimodal._load_video_codec."""
    import struct

    import numpy as np

    arr = np.ascontiguousarray(np.asarray(frames, dtype=np.uint8))
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8 RGB")
    n, h, w, _ = arr.shape
    row_pad = (-(w * 3)) % 4
    stride = w * 3 + row_pad

    def dib(frame: "np.ndarray") -> bytes:
        bgr = frame[::-1, :, ::-1]  # bottom-up rows, BGR channel order
        if row_pad:
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            return padded.tobytes()
        return bgr.tobytes()

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    frame_bytes = stride * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        frame_bytes * fps,  # dwMaxBytesPerSec
        0, 0x10,           # padding, AVIF_HASINDEX off / plain flags
        n, 0, 1,           # totalframes, initialframes, streams
        frame_bytes,       # suggested buffer
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,    # flags, priority, language, initialframes
            1, fps,        # dwScale, dwRate  (fps = rate/scale)
            0, n,          # start, length (frames)
            frame_bytes, 0xFFFFFFFF, 0,  # bufsize, quality, samplesize
            0, 0, w, h,    # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in arr))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)
