"""Deterministic HTML -> text extraction kernel.

Semantics mirror the reference's deterministic extraction components:

- encoding cascade ``utf-8 -> utf-8-sig -> latin-1 -> cp1252`` exactly as
  ``/root/reference/src/code_indexer/indexing/fixed_size_chunker.py:264-277``
  (note: latin-1 never fails, so cp1252 is unreachable — we preserve that
  quirk for parity; cp1252 bytes therefore decode via latin-1).
- ``<img src>`` extraction via stdlib ``html.parser.HTMLParser``, first
  ``src`` attribute only, http(s)/data-URI filtered out, like
  ``/root/reference/src/code_indexer/indexing/image_extractor.py:420-440``
  (``_ImgTagParser``) and ``:293-344`` (``extract_images`` filters).
- text extraction itself is ours (the reference indexes code files, not
  HTML pages): stdlib HTMLParser, script/style dropped, block-level tags
  emit newlines, entities unescaped (convert_charrefs), lines stripped,
  empty lines dropped. Fully deterministic, stdlib-only, no network.

These functions are the BYTE-IDENTICAL contract: the fixture generator
writes ``pages.text = extract_text(html)`` and the Spark Arrow UDF must
reproduce it exactly (asserted by tests/test_extraction_golden.py).
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tags whose content is dropped entirely.
_SKIP_CONTENT_TAGS = frozenset({"script", "style", "noscript", "template"})

# Tags that imply a line break in the extracted text.
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
        "li", "ul", "ol", "tr", "table", "br", "title", "header",
        "footer", "section", "article", "blockquote", "pre", "hr",
    }
)

# Encoding cascade — order pinned to fixed_size_chunker.py:265.
ENCODING_CASCADE = ("utf-8", "utf-8-sig", "latin-1", "cp1252")

IMG_SUPPORTED_FORMATS = frozenset({".png", ".jpg", ".jpeg", ".webp", ".gif"})


def decode_bytes(raw: bytes | None) -> str:
    """Decode bytes via the reference's encoding cascade. A NULL html
    cell (nullable binary column — present in crawl data) decodes to
    the empty string: one missing page must degrade to zero chunks and
    zero triples, never crash the whole Arrow batch's task."""
    if raw is None:
        return ""
    for enc in ENCODING_CASCADE:
        try:
            return raw.decode(enc)
        except UnicodeDecodeError:
            continue
    # Unreachable in practice (latin-1 accepts any byte string); kept for
    # structural parity with the reference's "could not decode" error path.
    raise ValueError("could not decode bytes")


class _TextAndImgParser(HTMLParser):
    """Single-pass extractor for visible text and <img src> attributes."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.img_sources: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth += 1
            return
        if tag == "img":
            # First src attribute only, mirroring _ImgTagParser
            # (image_extractor.py:434-440).
            for name, value in attrs:
                if name == "src" and value:
                    self.img_sources.append(value.strip())
                    break
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_CONTENT_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        # <br/>, <img .../> etc.
        self.handle_starttag(tag, attrs)

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.parts.append(data)


def _parse(html: str) -> _TextAndImgParser:
    parser = _TextAndImgParser()
    parser.feed(html)
    parser.close()
    return parser


# --- fast scanner -----------------------------------------------------------
# A conservative single-pass scanner for the common well-formed subset of
# web HTML. It produces EXACTLY the same (parts, img_sources) as
# _TextAndImgParser or returns None and the stdlib parser runs instead —
# any construct outside the verified subset (declarations, comments,
# processing instructions, unquoted/odd attributes, loose '&', unclosed
# tags) trips the fallback. Differential equality is pinned two ways:
# tests/test_extraction_golden.py::test_fast_scanner_differential fuzzes
# adversarial markup, and the full fixture corpus is asserted equal in
# the same module. ~6x faster than html.parser on CommonCrawl-shaped
# pages, which made extraction the hot spot after the round-2 NLP opts.

import re as _re
from html import unescape as _unescape

_STRICT_CHARREF_RE = _re.compile(
    r"&([a-zA-Z][a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);")
_TAG_NAME_RE = _re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
_ATTR_RE = _re.compile(r'\s+([a-zA-Z][a-zA-Z0-9_-]*)\s*=\s*"([^"<>]*)"')


def _fast_data(s: str):
    """Unescape a data segment, or None if any '&' is not a strict
    well-terminated charref (those edge forms go to the real parser)."""
    if "&" not in s:
        return s
    if _STRICT_CHARREF_RE.sub("", s).find("&") != -1:
        return None
    return _unescape(s)


_CDATA_END = {
    t: _re.compile(r"</\s*%s\s*>" % t, _re.I) for t in ("script", "style")
}


def _fast_scan(html: str):
    """-> (parts, img_sources) or None (= use _TextAndImgParser).

    Depth/CDATA bookkeeping mirrors the stdlib parser exactly:
    script/style enter CDATA mode (content raw until ``</\\s*tag\\s*>``)
    but a SELF-CLOSED ``<script/>`` does not (handle_startendtag skips
    set_cdata_mode); noscript/template drop data via the depth counter
    while inner tags still emit block newlines and img srcs (the
    handlers never consult the depth)."""
    parts: list[str] = []
    imgs: list[str] = []
    i = 0
    depth = 0  # _TextAndImgParser._skip_depth
    n = len(html)
    while i < n:
        lt = html.find("<", i)
        if lt == -1:
            if i < n and depth == 0:
                d = _fast_data(html[i:])
                if d is None:
                    return None
                parts.append(d)
            break
        if lt > i and depth == 0:
            d = _fast_data(html[i:lt])
            if d is None:
                return None
            parts.append(d)
        gt = html.find(">", lt)
        if gt == -1:
            return None  # unclosed tag: parser has buffering semantics
        body = html[lt + 1:gt]
        if not body or body[0] in "!?":
            return None  # declaration/comment/PI
        if body.count('"') % 2 == 1:
            return None  # '>' likely inside a quoted attribute value
        closing = body.startswith("/")
        name_src = body[1:] if closing else body
        m = _TAG_NAME_RE.match(name_src)
        if m is None:
            return None
        tag = m.group(0).lower()
        rest = name_src[m.end():]
        # the parser accepts '/' only IMMEDIATELY before '>' ('<br / >'
        # degrades to data there) — a stranded slash falls back
        startend = rest.endswith("/")
        if startend:
            rest = rest[:-1]
        elif rest.rstrip().endswith("/"):
            return None
        if closing:
            if rest.strip():
                return None  # attributes on an end tag: let parser decide
            if tag in _SKIP_CONTENT_TAGS:
                depth = max(0, depth - 1)
            elif tag in _BLOCK_TAGS:
                parts.append("\n")
            i = gt + 1
            continue
        # verify the attribute region parses in the strict quoted form —
        # anything else (single quotes, unquoted, bare names) falls back
        if rest.strip() and _ATTR_RE.sub("", rest).strip():
            return None
        if tag == "img":
            for aname, aval in _ATTR_RE.findall(rest):
                if aname.lower() == "src":
                    # break only after a NON-empty src, mirroring the
                    # parser exactly: on <img src="" src="b.png"> the
                    # parser skips the empty value and takes b.png
                    if aval:
                        if "&" in aval:
                            return None  # parser unescapes attr values
                        imgs.append(aval.strip())
                        break
        if tag in _SKIP_CONTENT_TAGS:
            if startend or tag not in _CDATA_END:
                # <script/> or noscript/template: depth only, keep parsing
                depth += 1
                i = gt + 1
                continue
            # CDATA mode: raw until the close-tag regex; net depth 0
            mm = _CDATA_END[tag].search(html, gt + 1)
            if mm is None:
                return None
            i = mm.end()
            continue
        if tag in _BLOCK_TAGS:
            parts.append("\n")
        i = gt + 1
    return parts, imgs


def normalize_text(raw: str) -> str:
    """Strip each line, drop empty lines, join with single newlines."""
    lines = [ln.strip() for ln in raw.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_text(html_bytes: bytes) -> str:
    """bytes -> byte-exact extracted text (the golden contract)."""
    return extract_page(html_bytes)[0]


def extract_page(html_bytes: bytes) -> tuple[str, list[str]]:
    """bytes -> (extracted_text, image_srcs_after_filtering).

    Image filtering per image_extractor.py:330-337: drop http(s) URLs and
    data: URIs; keep local paths (normalized, leading '/' stripped; paths
    escaping the site root via '..' are rejected -> image_extractor.py:36-67).
    """
    html = decode_bytes(html_bytes)
    fast = _fast_scan(html)
    if fast is not None:
        parts, img_sources = fast
    else:
        parser = _parse(html)
        parts, img_sources = parser.parts, parser.img_sources
    text = normalize_text("".join(parts))
    images: list[str] = []
    for src in img_sources:
        if src.startswith(("http://", "https://")):
            continue
        if src.startswith("data:"):
            continue
        resolved = _resolve_local_path(src)
        if resolved:
            images.append(resolved)
    return text, images


def _resolve_local_path(src: str) -> str:
    """Resolve a local image path relative to the site root.

    Mirrors ImageExtractor._resolve_image_path (image_extractor.py:36-67):
    leading '/' is stripped (absolute = site-root-relative), '.'/'..'
    segments are resolved lexically, and any path escaping the root
    returns '' (rejected).
    """
    parts = src.lstrip("/").split("/")
    out: list[str] = []
    for part in parts:
        if part in ("", "."):
            continue
        if part == "..":
            if not out:
                return ""  # escapes the root
            out.pop()
        else:
            out.append(part)
    return "/".join(out)


def validate_image(path: str) -> tuple[bool, str | None]:
    """Format check only (no filesystem at web scale).

    Reference checks exists/format/size/boundary
    (image_extractor.py:69-122); in a web corpus only the format check is
    computable from the path — existence/size live in a separate asset
    table at scale (joined on demand).
    """
    dot = path.rfind(".")
    ext = path[dot:].lower() if dot >= 0 else ""
    if ext not in IMG_SUPPORTED_FORMATS:
        return False, "unsupported_format"
    return True, None


MD_IMAGE_RE = None  # lazily compiled (keeps module import light)


def extract_markdown_images(text: str) -> list[str]:
    """P4: markdown ``![alt](src)`` image refs — the regex, the
    remote-URL filter, and the root-boundary resolution of the
    reference's markdown extractor (image_extractor.py:163-210; pattern
    :162), sharing _resolve_local_path with the HTML path."""
    global MD_IMAGE_RE
    if MD_IMAGE_RE is None:
        import re

        MD_IMAGE_RE = re.compile(r"!\[[^\]]*\]\(([^)]+)\)")
    out: list[str] = []
    for m in MD_IMAGE_RE.finditer(text or ""):
        src = m.group(1).strip()
        if src.startswith(("http://", "https://")):
            continue
        resolved = _resolve_local_path(src)
        if resolved:
            out.append(resolved)
    return out
