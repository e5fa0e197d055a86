"""URL parsing / canonicalization with Go ``net/url`` semantics.

The reference engine's *entire* identity model hangs off Go's URL
parser: ``page_id = SHA1(u.Hostname() + u.EscapedPath())``
(reference: ``pkg/linkutils/linkutils.go:66-71``), relative hrefs are
resolved with ``(*url.URL).ResolveReference`` (RFC 3986; reference:
``pkg/linkprocessor/linkprocessor.go:151-153``), and the stored page
``url`` column is ``u.String()`` (reference:
``pkg/linkstorage/linkstorage.go:489``).  Python's ``urllib.parse``
diverges from Go on escaped-path canonicalization, port/host splitting,
and several resolution corner cases, so this module is a faithful
from-scratch reimplementation of the relevant subset of Go's
``net/url`` (itself an implementation of RFC 3986) in pure Python.

Nothing here touches Ray; these are scalar building blocks that the
vectorized batch stages call per row.

Scope / deliberate deviations (documented, exercised in tests):
- ``encodeZone`` (IPv6 zone identifiers, RFC 6874) is validated only
  loosely (zones are astronomically rare in web crawls).
- ``viaRequest`` parse mode is not implemented (we only parse
  free-standing URLs, as the reference does).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

__all__ = [
    "URLError",
    "GoURL",
    "parse",
    "resolve_path",
    "page_id_from_parts",
    "go_path_ext",
]


class URLError(ValueError):
    """Raised where Go's net/url would return an error."""


_HEX = "0123456789ABCDEFabcdef"
_UPPERHEX = "0123456789ABCDEF"

# encoding modes (mirror Go's net/url internal `encoding` enum)
ENC_PATH = 1
ENC_PATH_SEGMENT = 2
ENC_HOST = 3
ENC_ZONE = 4
ENC_USER_PASSWORD = 5
ENC_QUERY = 6
ENC_FRAGMENT = 7


def _is_hex(c: str) -> bool:
    return c in _HEX


def _unhex(c: str) -> int:
    return int(c, 16)


def _should_escape(c: int, mode: int) -> bool:
    """Port of net/url shouldEscape (RFC 3986 §2.2/§2.3 tables)."""
    ch = chr(c)
    if "a" <= ch <= "z" or "A" <= ch <= "Z" or "0" <= ch <= "9":
        return False

    if mode in (ENC_HOST, ENC_ZONE):
        # §3.2.2 sub-delims plus : [ ] < > " (see Go's comment)
        if ch in "!$&'()*+,;=:[]<>\"":
            return False

    if ch in "-_.~":  # §2.3 unreserved marks
        return False

    if ch in "$&+,/:;=?@":  # §2.2 reserved
        if mode == ENC_PATH:
            return ch == "?"
        if mode == ENC_PATH_SEGMENT:
            return ch in "/;,?"
        if mode == ENC_USER_PASSWORD:
            return ch in "@/?:"
        if mode == ENC_QUERY:
            return True
        if mode == ENC_FRAGMENT:
            return False

    if mode == ENC_FRAGMENT and ch in "!()*":
        return False

    return True


# Precomputed per-mode tables (hot path: these functions run per URL per
# anchor across the whole crawl — keep the common case at C speed).
_ESC_TBL: dict[int, tuple] = {}
for _mode in (ENC_PATH, ENC_PATH_SEGMENT, ENC_HOST, ENC_ZONE, ENC_USER_PASSWORD, ENC_QUERY, ENC_FRAGMENT):
    _safe = bytes(b for b in range(256) if not _should_escape(b, _mode))
    _ESC_TBL[_mode] = (_safe, frozenset(_safe))
# bytes allowed to appear UNESCAPED in a host (non-ASCII always allowed)
_HOST_SAFE = bytes(
    b for b in range(256) if b >= 0x80 or not _should_escape(b, ENC_HOST)
) + b"%"

import re as _re

_CTL_RE = _re.compile(r"[\x00-\x1f\x7f]")


def _unescape(s: str, mode: int) -> str:
    """Port of net/url unescape: validate then %-decode.

    Operates on str whose code points <= 0x10FFFF; percent sequences
    decode to *bytes* which are then interpreted as UTF-8 (invalid
    sequences surface as surrogate escapes so byte fidelity is kept,
    matching Go strings which are arbitrary bytes).
    """
    if "%" not in s:
        # fast path: no escapes to decode; only host/zone/query modes
        # need any further inspection
        if mode == ENC_QUERY and "+" in s:
            return s.replace("+", " ")
        if mode in (ENC_HOST, ENC_ZONE):
            leftover = s.encode("utf-8", "surrogateescape").translate(None, _HOST_SAFE)
            if leftover:
                raise URLError(f"invalid character {chr(leftover[0])!r} in host name")
        return s
    n = 0
    has_plus = False
    i = 0
    L = len(s)
    while i < L:
        ch = s[i]
        if ch == "%":
            n += 1
            if i + 2 >= L or not _is_hex(s[i + 1]) or not _is_hex(s[i + 2]):
                bad = s[i : i + 3]
                raise URLError(f"invalid URL escape {bad!r}")
            # In the host component %-encoding can only be used for
            # non-ASCII bytes (RFC 3986 p.21), except %25 (RFC 6874).
            if mode == ENC_HOST and _unhex(s[i + 1]) < 8 and s[i : i + 3] != "%25":
                raise URLError(f"invalid URL escape {s[i:i+3]!r}")
            if mode == ENC_ZONE:
                v = _unhex(s[i + 1]) << 4 | _unhex(s[i + 2])
                if s[i : i + 3] != "%25" and v < 0x80 and _should_escape(v, ENC_HOST):
                    raise URLError(f"invalid URL escape {s[i:i+3]!r}")
            i += 3
        elif ch == "+":
            has_plus = mode == ENC_QUERY
            i += 1
        else:
            cp = ord(ch)
            if mode in (ENC_HOST, ENC_ZONE) and cp < 0x80 and _should_escape(cp, mode):
                raise URLError(f"invalid character {ch!r} in host name")
            i += 1

    if n == 0 and not has_plus:
        return s

    out = bytearray()
    i = 0
    while i < L:
        ch = s[i]
        if ch == "%":
            out.append(_unhex(s[i + 1]) << 4 | _unhex(s[i + 2]))
            i += 3
        elif ch == "+":
            out.append(0x20 if mode == ENC_QUERY else 0x2B)
            i += 1
        else:
            out.extend(ch.encode("utf-8", "surrogateescape"))
            i += 1
    return out.decode("utf-8", "surrogateescape")


def _escape(s: str, mode: int) -> str:
    """Port of net/url escape: %-encode bytes per shouldEscape table."""
    raw = s.encode("utf-8", "surrogateescape")
    safe_bytes, safe_set = _ESC_TBL[mode]
    if not raw.translate(None, safe_bytes):
        return s  # fast path: nothing needs escaping (C-speed check)
    out = []
    for b in raw:
        if b == 0x20 and mode == ENC_QUERY:
            out.append("+")
        elif b not in safe_set:
            out.append("%" + _UPPERHEX[b >> 4] + _UPPERHEX[b & 0xF])
        else:
            out.append(chr(b))
    return "".join(out)


def _valid_encoded(s: str, mode: int) -> bool:
    """Port of net/url validEncoded (is s a valid encoded path/fragment)."""
    for ch in s:
        if ch in "!$&'()*+,;=:@[]":
            continue
        if ch == "%":
            continue  # percent sequence, will decode
        cp = ord(ch)
        if cp > 0x7F:
            # Non-ASCII runes: Go iterates bytes; every byte of a
            # multi-byte rune is >= 0x80 and shouldEscape(b)=True for
            # those -> validEncoded would return False.
            return False
        if _should_escape(cp, mode):
            return False
    return True


def _valid_optional_port(port: str) -> bool:
    if port == "":
        return True
    if not port.startswith(":"):
        return False
    return all("0" <= c <= "9" for c in port[1:])


def _valid_userinfo(s: str) -> bool:
    for ch in s:
        if (
            "A" <= ch <= "Z"
            or "a" <= ch <= "z"
            or "0" <= ch <= "9"
            or ch in "-._:~!$&'()*+,;=%@"
        ):
            continue
        return False
    return True


def _contains_ctl_byte(s: str) -> bool:
    return _CTL_RE.search(s) is not None


@dataclass
class _Userinfo:
    username: str = ""
    password: str = ""
    password_set: bool = False

    def string(self) -> str:
        s = _escape(self.username, ENC_USER_PASSWORD)
        if self.password_set:
            s += ":" + _escape(self.password, ENC_USER_PASSWORD)
        return s


@dataclass
class GoURL:
    """Mirror of Go's url.URL struct (the fields the engine uses)."""

    scheme: str = ""
    opaque: str = ""
    user: _Userinfo | None = None
    host: str = ""  # host or host:port (decoded)
    path: str = ""  # decoded path
    raw_path: str = ""  # encoded path hint, set only when non-canonical
    force_query: bool = False
    raw_query: str = ""
    fragment: str = ""
    raw_fragment: str = ""
    # Go 1.19+ OmitHost: set when a rootless-absolute URL like
    # 'http:/foo.html' is parsed (scheme present, path-absolute, no
    # authority); String() then skips the '//' so the round-trip is exact
    omit_host: bool = False

    # -- accessors ---------------------------------------------------------

    def is_abs(self) -> bool:
        return self.scheme != ""

    def hostname(self) -> str:
        host, _ = _split_host_port(self.host)
        return host

    def port(self) -> str:
        _, port = _split_host_port(self.host)
        return port

    def escaped_path(self) -> str:
        if self.raw_path != "" and _valid_encoded(self.raw_path, ENC_PATH):
            try:
                p = _unescape(self.raw_path, ENC_PATH)
            except URLError:
                p = None
            if p is not None and p == self.path:
                return self.raw_path
        if self.path == "*":
            return "*"
        return _escape(self.path, ENC_PATH)

    def escaped_fragment(self) -> str:
        if self.raw_fragment != "" and _valid_encoded(self.raw_fragment, ENC_FRAGMENT):
            try:
                f = _unescape(self.raw_fragment, ENC_FRAGMENT)
            except URLError:
                f = None
            if f is not None and f == self.fragment:
                return self.raw_fragment
        return _escape(self.fragment, ENC_FRAGMENT)

    # -- mutators ----------------------------------------------------------

    def _set_path(self, p: str) -> None:
        path = _unescape(p, ENC_PATH)
        self.path = path
        self.raw_path = "" if _escape(path, ENC_PATH) == p else p

    def _set_fragment(self, f: str) -> None:
        frag = _unescape(f, ENC_FRAGMENT)
        self.fragment = frag
        self.raw_fragment = "" if _escape(frag, ENC_FRAGMENT) == f else f

    # -- serialization -----------------------------------------------------

    def string(self) -> str:
        """Port of (*url.URL).String()."""
        buf = []
        if self.scheme != "":
            buf.append(self.scheme)
            buf.append(":")
        if self.opaque != "":
            buf.append(self.opaque)
        else:
            if self.scheme != "" or self.host != "" or self.user is not None:
                if self.omit_host and self.host == "" and self.user is None:
                    pass  # Go 1.19 OmitHost: no '//' for http:/path URLs
                else:
                    if self.host != "" or self.path != "" or self.user is not None:
                        buf.append("//")
                    if self.user is not None:
                        buf.append(self.user.string())
                        buf.append("@")
                    if self.host != "":
                        buf.append(_escape(self.host, ENC_HOST))
            path = self.escaped_path()
            if path != "" and not path.startswith("/") and self.host != "":
                buf.append("/")
            if not buf:
                # relative-path reference whose first segment has a colon
                segment = path.split("/", 1)[0]
                if ":" in segment:
                    buf.append("./")
            buf.append(path)
        if self.force_query or self.raw_query != "":
            buf.append("?")
            buf.append(self.raw_query)
        if self.fragment != "":
            buf.append("#")
            buf.append(self.escaped_fragment())
        return "".join(buf)

    # -- resolution --------------------------------------------------------

    def resolve_reference(self, ref: "GoURL") -> "GoURL":
        """Port of (*url.URL).ResolveReference (RFC 3986 §5.3)."""
        url = GoURL(
            scheme=ref.scheme,
            opaque=ref.opaque,
            user=ref.user,
            host=ref.host,
            path=ref.path,
            raw_path=ref.raw_path,
            force_query=ref.force_query,
            raw_query=ref.raw_query,
            fragment=ref.fragment,
            raw_fragment=ref.raw_fragment,
            omit_host=ref.omit_host,  # Go: url := *ref copies OmitHost
        )
        if ref.scheme == "":
            url.scheme = self.scheme
        if ref.scheme != "" or ref.host != "" or ref.user is not None:
            # absoluteURI or net_path
            url._set_path(resolve_path(ref.escaped_path(), ""))
            return url
        if ref.opaque != "":
            url.user = None
            url.host = ""
            url.path = ""
            return url
        if ref.path == "" and not ref.force_query and ref.raw_query == "":
            url.raw_query = self.raw_query
            if ref.fragment == "":
                url.fragment = self.fragment
                url.raw_fragment = self.raw_fragment
        url.host = self.host
        url.user = self.user
        url._set_path(resolve_path(self.escaped_path(), ref.escaped_path()))
        return url


def _split_host_port(host_port: str) -> tuple[str, str]:
    host, port = host_port, ""
    colon = host_port.rfind(":")
    if colon != -1 and _valid_optional_port(host_port[colon:]):
        host, port = host_port[:colon], host_port[colon + 1 :]
    if host.startswith("[") and host.endswith("]"):
        host = host[1:-1]
    return host, port


def _get_scheme(raw: str) -> tuple[str, str]:
    for i, ch in enumerate(raw):
        if "a" <= ch <= "z" or "A" <= ch <= "Z":
            continue
        if "0" <= ch <= "9" or ch in "+-.":
            if i == 0:
                return "", raw
            continue
        if ch == ":":
            if i == 0:
                raise URLError("missing protocol scheme")
            return raw[:i], raw[i + 1 :]
        return "", raw
    return "", raw


def _parse_host(host: str) -> str:
    if host.startswith("["):
        i = host.rfind("]")
        if i < 0:
            raise URLError("missing ']' in host")
        colon_port = host[i + 1 :]
        if not _valid_optional_port(colon_port):
            raise URLError(f"invalid port {colon_port!r} after host")
        zone = host[:i].find("%25")
        if zone >= 0:
            host1 = _unescape(host[:zone], ENC_HOST)
            host2 = _unescape(host[zone:i], ENC_ZONE)
            host3 = _unescape(host[i:], ENC_HOST)
            return host1 + host2 + host3
    else:
        i = host.rfind(":")
        if i != -1:
            colon_port = host[i:]
            if not _valid_optional_port(colon_port):
                raise URLError(f"invalid port {colon_port!r} after host")
    return _unescape(host, ENC_HOST)


def _parse_authority(authority: str) -> tuple[_Userinfo | None, str]:
    i = authority.rfind("@")
    if i < 0:
        host = _parse_host(authority)
        return None, host
    host = _parse_host(authority[i + 1 :])
    userinfo = authority[:i]
    if not _valid_userinfo(userinfo):
        raise URLError("invalid userinfo")
    if ":" not in userinfo:
        user = _Userinfo(username=_unescape(userinfo, ENC_USER_PASSWORD))
    else:
        username, password = userinfo.split(":", 1)
        user = _Userinfo(
            username=_unescape(username, ENC_USER_PASSWORD),
            password=_unescape(password, ENC_USER_PASSWORD),
            password_set=True,
        )
    return user, host


def parse(raw_url: str) -> GoURL:
    """Port of url.Parse: parse raw_url into a GoURL or raise URLError."""
    # Cut off #frag
    if "#" in raw_url:
        u, frag = raw_url.split("#", 1)
    else:
        u, frag = raw_url, ""
    url = _parse_no_frag(u)
    if frag:
        url._set_fragment(frag)
    return url


def _parse_no_frag(raw_url: str) -> GoURL:
    if _contains_ctl_byte(raw_url):
        raise URLError("invalid control character in URL")

    url = GoURL()
    if raw_url == "*":
        url.path = "*"
        return url

    scheme, rest = _get_scheme(raw_url)
    url.scheme = scheme.lower()

    if rest.endswith("?") and "?" not in rest[:-1]:
        url.force_query = True
        rest = rest[:-1]
    elif "?" in rest:
        rest, url.raw_query = rest.split("?", 1)

    if not rest.startswith("/"):
        if url.scheme != "":
            # opaque URI like mailto:user@example.com
            url.opaque = rest
            return url
        # rootless relative path: first segment must not contain ':'
        segment = rest.split("/", 1)[0]
        if ":" in segment:
            raise URLError("first path segment in URL cannot contain colon")

    if (url.scheme != "" or not rest.startswith("///")) and rest.startswith("//"):
        authority = rest[2:]
        slash = authority.find("/")
        if slash >= 0:
            authority, rest = authority[:slash], authority[slash:]
        else:
            rest = ""
        url.user, url.host = _parse_authority(authority)
    elif url.scheme != "" and rest.startswith("/"):
        url.omit_host = True  # Go 1.19+: 'http:/foo.html' keeps no '//'
    url._set_path(rest)
    return url


def resolve_path(base: str, ref: str) -> str:
    """Port of net/url resolvePath (RFC 3986 §5.3.4 merge + remove_dot_segments)."""
    if ref == "":
        full = base
    elif not ref.startswith("/"):
        i = base.rfind("/")
        full = base[: i + 1] + ref
    else:
        full = ref
    if full == "":
        return ""

    src = full.split("/")
    dst: list[str] = []
    for elem in src:
        if elem == ".":
            pass  # drop
        elif elem == "..":
            if dst:
                dst.pop()
        else:
            dst.append(elem)
    if src[-1] in (".", ".."):
        dst.append("")  # trailing slash after a final dot segment
    joined = "/".join(dst)
    if joined.startswith("/"):
        joined = joined[1:]
    return "/" + joined


# ---------------------------------------------------------------------------
# Identity + filters' scalar helpers
# ---------------------------------------------------------------------------


def page_id_from_parts(hostname: str, escaped_path: str) -> str:
    """page_id = SHA1(hostname + escaped_path), lowercase hex.

    Reference: ``pkg/linkutils/linkutils.go:66-71`` and the client-side
    JS twin at ``frontend/index.html:68-78``.  Scheme, port, query and
    fragment are deliberately excluded from identity.
    """
    h = hashlib.sha1()
    h.update((hostname + escaped_path).encode("utf-8", "surrogateescape"))
    return h.hexdigest()


def go_path_ext(path: str) -> str:
    """Port of Go path/filepath.Ext: suffix from the final dot of the
    final path element ('' if none). Case-sensitive, like the reference
    (``pkg/linkutils/linkutils.go:41-50`` compares to '.html'/'.htm')."""
    for i in range(len(path) - 1, -1, -1):
        c = path[i]
        if c == "/":
            return ""
        if c == ".":
            return path[i:]
    return ""
