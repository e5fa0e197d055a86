"""HTML anchor + text extraction (the flagship per-record transform).

Reproduces the reference's extract semantics
(``pkg/linkprocessor/linkprocessor.go:127-168``):

- iterate ``<a>`` elements in document order (goquery ``Find("a").Each``)
- skip anchors with no ``href`` attribute (``linkprocessor.go:139-142``)
- ``href`` is whitespace-trimmed (``:143``), parsed, and — when not
  absolute — resolved against the page URL per RFC 3986 (``:151-153``)
- link text = concatenation of ALL descendant text nodes of the anchor
  (goquery ``element.Text()``, ``:162``), entities decoded
- invalid UTF-8 bytes in link text are DELETED, not replaced — Go's
  ``strings.ToValidUTF8(text, "")`` (``pkg/linkstorage/linkstorage.go:408``)
- unparseable hrefs are silently skipped (``:145-149``)

Additionally extracts the page's full document text (all text nodes in
document order, entities decoded) — the per-url "extracted text" whose
byte-identity against the corpus ``text`` column is the north-rule
invariant.

HTML5 nesting note: an ``<a>`` start tag while another ``<a>`` is open
implicitly closes the previous one (the HTML5 adoption-agency behavior
of Go's ``x/net/html`` parser that goquery sits on); reproduced here.
"""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser

__all__ = ["Anchor", "ExtractResult", "extract_html", "to_valid_utf8", "decode_html"]


def to_valid_utf8(s: str) -> str:
    """Go ``strings.ToValidUTF8(s, "")``: delete invalid byte sequences.

    Invalid input bytes travel through this codebase as lone
    surrogates (surrogateescape decoding); encoding with errors
    ignored deletes exactly those bytes.
    """
    try:
        s.encode("utf-8")
        return s
    except UnicodeEncodeError:
        return s.encode("utf-8", "ignore").decode("utf-8")


def decode_html(html: bytes | str) -> str:
    """Bytes → str preserving invalid bytes as lone surrogates."""
    if isinstance(html, str):
        return html
    return html.decode("utf-8", "surrogateescape")


@dataclass
class Anchor:
    index: int  # document-order index among emitted anchors (has href)
    href: str  # raw href attribute value (entity-decoded, untrimmed)
    text: str  # all descendant text, entity-decoded, invalid UTF-8 deleted


@dataclass
class ExtractResult:
    anchors: list[Anchor]
    doc_text: str  # full document text (north-rule per-url text)


class _AnchorParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[Anchor] = []
        self._doc_text: list[str] = []
        self._open: list[str] | None = None  # text accumulator of open <a>
        self._open_href: str | None = None
        self._open_has_href = False

    # -- helpers -----------------------------------------------------------

    def _close_anchor(self) -> None:
        if self._open is not None and self._open_has_href:
            self.anchors.append(
                Anchor(
                    index=len(self.anchors),
                    href=self._open_href or "",
                    text=to_valid_utf8("".join(self._open)),
                )
            )
        self._open = None
        self._open_href = None
        self._open_has_href = False

    # -- HTMLParser hooks --------------------------------------------------

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag == "a":
            if self._open is not None:
                # HTML5: a new <a> implicitly closes an open <a>
                self._close_anchor()
            self._open = []
            for k, v in attrs:
                if k == "href":  # first occurrence wins (HTML5 duplicate-attr rule)
                    self._open_has_href = True
                    self._open_href = v if v is not None else ""
                    break

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # "<a href=x />" — HTML5 ignores the solidus on non-void elements,
        # so treat it as a plain start tag.
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._open is not None:
            self._close_anchor()

    def handle_data(self, data: str) -> None:
        self._doc_text.append(data)
        if self._open is not None:
            self._open.append(data)

    def close(self) -> None:
        super().close()
        if self._open is not None:
            self._close_anchor()


def extract_html(html: bytes | str) -> ExtractResult:
    """Parse one HTML document → anchors (document order) + full text."""
    parser = _AnchorParser()
    parser.feed(decode_html(html))
    parser.close()
    return ExtractResult(
        anchors=parser.anchors,
        doc_text=to_valid_utf8("".join(parser._doc_text)),
    )
