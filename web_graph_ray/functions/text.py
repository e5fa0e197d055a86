"""Text-analysis primitives for large-scale training-data pipelines.

No counterpart in the reference (it stores no text beyond anchor text);
these are the standard web-text curation operators a 100 TB pipeline
needs, built to run vectorized inside ``map_batches``:

- token counting (simple word regex + a BPE-ish segmentation regex)
- quality scoring (length / character-class ratios / token stats)
- language ID (stopword-profile heuristic — deterministic, no model)
- document fingerprinting (Karp-Rabin rolling hash)
- shingling + MinHash + SimHash signatures (inputs to the dedup stages)

All functions are pure and seed-free; numeric outputs are float64/int64
so DuckDB oracles can reproduce them bit-for-bit where expressible.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "WORD_RE",
    "BPE_RE",
    "tokenize",
    "token_count",
    "bpe_piece_count",
    "quality_metrics",
    "detect_lang",
    "enrich_features",
    "fingerprint",
    "char_shingles",
    "minhash_signature",
    "simhash64",
    "levenshtein_bytes",
]

WORD_RE = re.compile(r"[A-Za-z0-9]+")
# BPE-ish pre-tokenization: letter runs, single digits, punctuation runs
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+")

_MASK64 = 0xFFFFFFFFFFFFFFFF
_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211


def _fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def tokenize(text: str) -> list[str]:
    return WORD_RE.findall(text)


def token_count(text: str) -> int:
    return len(WORD_RE.findall(text))


def bpe_piece_count(text: str) -> int:
    return len(BPE_RE.findall(text))


# single-pass ASCII class counters: byte-level counting equals
# char-level for ASCII classes (UTF-8 continuation bytes are >= 0x80,
# never in [A-Za-z0-9]); translate(None, delete_table) is one C pass
_ALPHA_BYTES = bytes(range(65, 91)) + bytes(range(97, 123))
_DIGIT_BYTES = bytes(range(48, 58))
_NON_ALPHA = bytes(b for b in range(256) if b not in _ALPHA_BYTES)
_NON_DIGIT = bytes(b for b in range(256) if b not in _DIGIT_BYTES)


def _quality_from_tokens(text: str, toks: list[str]) -> dict:
    n = len(text)
    b = text.encode("utf-8", "surrogateescape")
    alpha = len(b.translate(None, _NON_ALPHA))
    digit = len(b.translate(None, _NON_DIGIT))
    denom = max(n, 1)
    return {
        "n_chars": n,
        "n_tokens": len(toks),
        "alpha_ratio": alpha / denom,
        "digit_ratio": digit / denom,
        "mean_token_len": (sum(map(len, toks)) / len(toks)) if toks else 0.0,
    }


def quality_metrics(text: str) -> dict:
    """Deterministic quality features (DuckDB-expressible subset).

    Ratios use max(len,1) denominators; all divisions are float64 over
    small ints, so SQL `cast(x as double)/y` reproduces them exactly.
    """
    return _quality_from_tokens(text, WORD_RE.findall(text))


# --- language ID (stopword-profile heuristic) ------------------------------

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "with", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "mit", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que", "des", "du"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por", "que", "del"},
    "it": {"il", "la", "che", "e", "di", "un", "una", "per", "non", "sono", "con", "del"},
}
_LANG_ORDER = tuple(sorted(_STOPWORDS))  # deterministic tie-break order


# word(lowercased) -> per-language hit index, for the single-pass scorer
_WORD_LANGS: dict[str, list[int]] = {}
for _li, _lang in enumerate(_LANG_ORDER):
    for _w in _STOPWORDS[_lang]:
        _WORD_LANGS.setdefault(_w, []).append(_li)


def _lang_from_tokens(toks: list[str], default: str = "und") -> str:
    if not toks:
        return default
    scores = [0] * len(_LANG_ORDER)
    get = _WORD_LANGS.get
    for w in toks:
        hit = get(w.lower())
        if hit is not None:
            for li in hit:
                scores[li] += 1
    best_lang, best_score = default, 0
    for li, lang in enumerate(_LANG_ORDER):
        if scores[li] > best_score:
            best_lang, best_score = lang, scores[li]
    return best_lang


def detect_lang(text: str, default: str = "und") -> str:
    """Stopword-hit-rate argmax; 'und' (undetermined) when no hits.
    Ties break by language code order — fully deterministic."""
    return _lang_from_tokens(WORD_RE.findall(text), default)


def enrich_features(text: str) -> dict:
    """lang + quality metrics with ONE tokenization pass — the inline
    crawl-enrichment hot path (identical outputs to detect_lang +
    quality_metrics called separately)."""
    toks = WORD_RE.findall(text)
    out = _quality_from_tokens(text, toks)
    out["lang_pred"] = _lang_from_tokens(toks)
    return out


# --- fingerprint -----------------------------------------------------------

_KR_BASE = 1000003


def fingerprint(text: str) -> int:
    """Karp-Rabin rolling hash over word tokens (order-sensitive
    document fingerprint), masked to signed int64 for Arrow/SQL."""
    h = 0
    for tok in WORD_RE.findall(text):
        h = (h * _KR_BASE + _fnv1a(tok.encode())) & _MASK64
    return h - (1 << 64) if h >= 1 << 63 else h


# --- shingles / MinHash / SimHash ------------------------------------------


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Hashed character k-gram shingle set (lowercased)."""
    t = text.lower()
    if len(t) < k:
        return {_fnv1a(t.encode())} if t else set()
    return {_fnv1a(t[i : i + k].encode()) for i in range(len(t) - k + 1)}


# MinHash permutations: h_i(x) = (a_i * x + b_i) mod p — parameters are
# derived deterministically (splitmix-style) from the permutation index.
_MERSENNE_P = (1 << 61) - 1


def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(1, num_perm + 1, dtype=np.uint64)
    mix = lambda z: (
        ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK64)
    )
    a = (mix(idx * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(_MERSENNE_P - 1)) + np.uint64(1)
    b = mix(idx * np.uint64(0xD1B54A32D192ED03)) % np.uint64(_MERSENNE_P)
    return a, b


_PERM_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingles: set[int], num_perm: int = 128) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a shingle set."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    if not shingles:
        return np.full(num_perm, np.uint64(_MASK64), dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a*x + b) mod p, computed in python-int space via object ops would be
    # slow; use uint64 wraparound then mod — deterministic and well-mixed.
    vals = (x[None, :] * a[:, None] + b[:, None]) % np.uint64(_MERSENNE_P)
    return vals.min(axis=1)


def minhash_signatures_batch(shingle_sets: list, num_perm: int = 128) -> np.ndarray:
    """Signatures for a whole batch of docs at once, bit-identical to
    per-doc ``minhash_signature``: stack shingle sets into one flat
    uint64 vector with doc offsets, then one in-place whole-vector pass
    per permutation (mul+add+mod into a reused temp) finished by a
    ``np.minimum.reduceat`` segment-min.  Cache-friendly streams beat
    both the per-doc loop (~2×) and a (num_perm × shingles) matrix
    (~4×); peak extra memory is 2 × total_shingles × 8 B regardless of
    num_perm.  Empty shingle sets keep the all-ones sentinel row."""
    if num_perm not in _PERM_CACHE:
        _PERM_CACHE[num_perm] = _perm_params(num_perm)
    a, b = _PERM_CACHE[num_perm]
    n = len(shingle_sets)
    out = np.full((n, num_perm), np.uint64(_MASK64), dtype=np.uint64)
    arrs, doc_idx = [], []
    for j, s in enumerate(shingle_sets):
        if s:
            arrs.append(np.fromiter(s, dtype=np.uint64, count=len(s)))
            doc_idx.append(j)
    if not arrs:
        return out
    lengths = np.fromiter(map(len, arrs), dtype=np.int64, count=len(arrs))
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    x = np.concatenate(arrs)
    doc_idx = np.asarray(doc_idx, dtype=np.int64)
    tmp = np.empty_like(x)
    p = np.uint64(_MERSENNE_P)
    with np.errstate(over="ignore"):
        for pi in range(num_perm):
            np.multiply(x, a[pi], out=tmp)
            np.add(tmp, b[pi], out=tmp)
            np.mod(tmp, p, out=tmp)
            out[doc_idx, pi] = np.minimum.reduceat(tmp, starts)
    return out


def simhash64(text: str, k: int = 5) -> int:
    """64-bit SimHash over hashed byte k-grams (signed int64).

    Fully vectorized: sliding byte windows → FNV-1a over the window
    columns (uint64 wraparound) → distinct hashes → per-bit majority
    vote.  Operates on UTF-8 *bytes* (not code points) — ~50× faster
    than a per-window Python loop and equally valid as a similarity
    fingerprint; deterministic and seed-free."""
    from numpy.lib.stride_tricks import sliding_window_view

    data = text.lower().encode("utf-8", "surrogateescape")
    if len(data) == 0:
        return 0
    if len(data) < k:
        hashes = np.array([_fnv1a(data)], dtype=np.uint64)
    else:
        arr = np.frombuffer(data, dtype=np.uint8)
        w = sliding_window_view(arr, k)
        h = np.full(w.shape[0], _FNV_OFFSET, dtype=np.uint64)
        prime = np.uint64(_FNV_PRIME)
        with np.errstate(over="ignore"):
            for j in range(k):
                h = (h ^ w[:, j].astype(np.uint64)) * prime
        hashes = np.unique(h)
    bits = np.unpackbits(
        hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    )
    ones = bits.sum(axis=0, dtype=np.int64)  # no 8-byte bit-matrix copy
    sign = ones * 2 > len(hashes)  # majority (+1/-1 vote > 0)
    out = 0
    for i in range(64):
        if sign[i]:
            out |= 1 << i
    return out - (1 << 64) if out >= 1 << 63 else out


# --- repetition metrics (Gopher-style repetitiousness filters) -------------


def repetition_metrics(text: str) -> dict:
    """Repetition fractions in the spirit of the Gopher quality rules
    (Rae et al. 2021, §A1.1: duplicate-line and repeated-n-gram
    filters), with exact, SQL-twinnable definitions:

    - dup_line_frac:      repeat line occurrences / total lines
                          (sum over line groups of (count-1) / sum count)
    - dup_line_char_frac: chars in repeat line occurrences / total line
                          chars (0.0 when all lines are empty)
    - top_bigram_frac:    occurrences of the most frequent token 2-gram
                          / total 2-grams (ties don't matter — only the
                          max count is used)
    - top_trigram_frac:   same for 3-grams

    Lines split on '\\n' (DuckDB string_split(text, chr(10)) parity);
    tokens are the lowercased ``[a-z0-9]+`` runs shared with the
    decontamination grams.  All divisions are float64 of small ints, so
    SQL cast(x as double)/y reproduces them exactly."""
    from collections import Counter

    lines = text.split("\n")
    lc = Counter(lines)
    n_lines = len(lines)
    dup_lines = n_lines - len(lc)
    total_chars = sum(len(l) * c for l, c in lc.items())
    dup_chars = sum(len(l) * (c - 1) for l, c in lc.items() if c > 1)

    toks = WORD_RE.findall(text.lower())

    def top_frac(n: int) -> float:
        total = len(toks) - n + 1
        if total <= 0:
            return 0.0
        grams = Counter(zip(*(toks[j:] for j in range(n))))
        return max(grams.values()) / total

    return {
        "dup_line_frac": dup_lines / n_lines,
        "dup_line_char_frac": (dup_chars / total_chars) if total_chars else 0.0,
        "top_bigram_frac": top_frac(2),
        "top_trigram_frac": top_frac(3),
    }


def levenshtein_bytes(a: bytes, b: bytes, max_dist: int | None = None) -> int:
    """Exact Levenshtein distance over UTF-8 BYTES (unit-cost
    insert/delete/substitute) — byte semantics deliberately match
    DuckDB's ``levenshtein()`` (which scores 'café'→'cafe' as 2, one
    substitute + one delete of the é bytes), so SQL oracle twins agree
    on non-ASCII input by construction.

    With ``max_dist`` set, runs the Ukkonen band (|i-j| ≤ max_dist
    cells only, O(len·max_dist)) and returns ``max_dist + 1`` as soon
    as the true distance provably exceeds the cap — the standard
    verify kernel for length-banded near-dup blocking."""
    if len(a) < len(b):
        a, b = b, a
    la, lb = len(a), len(b)
    if max_dist is None:
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            ca = a[i - 1]
            cur = [i]
            append = cur.append
            for j in range(1, lb + 1):
                append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != b[j - 1]))
                )
            prev = cur
        return prev[lb]
    big = max_dist + 1
    if la - lb > max_dist:
        return big
    if lb == 0:
        return min(la, big)
    prev = [j if j <= max_dist else big for j in range(lb + 1)]
    for i in range(1, la + 1):
        lo = max(1, i - max_dist)
        hi = min(lb, i + max_dist)
        cur = [big] * (lb + 1)
        if lo == 1:
            cur[0] = i if i <= max_dist else big
        row_min = cur[0] if lo == 1 else big
        ca = a[i - 1]
        for j in range(lo, hi + 1):
            v = prev[j] + 1
            w = cur[j - 1] + 1
            if w < v:
                v = w
            w = prev[j - 1] + (ca != b[j - 1])
            if w < v:
                v = w
            if v > big:
                v = big
            cur[j] = v
            if v < row_min:
                row_min = v
        if row_min >= big:
            return big
        prev = cur
    return prev[lb] if prev[lb] <= max_dist else big


def damerau_levenshtein_bytes(a: bytes, b: bytes) -> int:
    """Exact UNRESTRICTED Damerau-Levenshtein over UTF-8 bytes —
    insert/delete/substitute/transpose, where a transposed pair may be
    edited again (DuckDB's ``damerau_levenshtein('CA','ABC')`` is 2,
    not OSA's 3; byte semantics shared with :func:`levenshtein_bytes`).
    The classic alphabet-indexed DP (Lowrance-Wagner), O(|a|·|b|)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    inf = la + lb
    da = [0] * 256
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        ai = a[i - 1]
        for j in range(1, lb + 1):
            k = da[b[j - 1]]
            l = db
            if ai == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[ai] = i
    return d[la + 1][lb + 1]


def jaro_winkler_bytes(a: bytes, b: bytes) -> float:
    """Jaro-Winkler similarity over UTF-8 bytes, matching DuckDB's
    ``jaro_winkler_similarity`` exactly: match window
    max(|a|,|b|)//2 − 1, half-transposition count, ≤4-byte common
    prefix at scale 0.1, and the Winkler boost applied only when the
    Jaro base exceeds 0.7; either side empty scores 0.0 (including
    both-empty — verified against DuckDB 1.x)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        ai = a[i]
        for j in range(lo, hi):
            if not mb[j] and b[j] == ai:
                ma[i] = True
                mb[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if ma[i]:
            while not mb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    # C++-faithful transposition count: DuckDB (rapidfuzz) divides the
    # raw mismatch count by 2 in INTEGER arithmetic, so an odd count
    # truncates — (m - t//2)/m, not the textbook (m - t/2)/m
    jaro = (m / la + m / lb + (m - t // 2) / m) / 3.0
    if jaro > 0.7:
        prefix = 0
        for i in range(min(4, la, lb)):
            if a[i] != b[i]:
                break
            prefix += 1
        jaro += prefix * 0.1 * (1.0 - jaro)
    return jaro
