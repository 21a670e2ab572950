"""Pure-Python main-content extraction kernel (no Spark imports).

This is the generalization of the reference's per-document extraction
dataflow (adbertram/powerpoint_context_extractor): where the reference
opens a PPTX container and walks each slide's XML tree in document order
(`pptx_extractor/notes/extractor.py:29-106`,
`pptx_extractor/animations/extractor.py:37-231`), this kernel walks an
HTML DOM event stream in document order with **stable block IDs** (the
slide-number / shape-order analog, reference `pptx_extract.py:249`,
`notes/extractor.py:151`) and emits deterministic extracted text plus
character-span offsets per block.

Design contract (frozen; golden fixtures under tests/fixtures/ pin it):

* Input is raw bytes. ``%WDOC1`` magic routes to the simple layout
  parser; ``%PDF`` routes to the pdfminer-style PDF-subset layout
  parser (both are the analog of the reference's PPTX->PDF->image
  binary path, `slides/extractor.py:38-109`, re-expressed as
  in-process parses — never a subprocess per row). Everything else is
  parsed as UTF-8 HTML with the lenient stdlib parser.
* Traversal is strictly document order; every candidate block gets a
  monotonically increasing ``block_id`` whether or not it is kept, so
  IDs are stable under classification-rule changes.
* Whitespace rule: within a non-``pre`` block, all runs of whitespace
  collapse to a single space and ends are stripped. ``pre`` keeps inner
  whitespace verbatim and strips only the outer ends.
* Char counts for link-density use **non-whitespace** characters only,
  and classification uses integer arithmetic (no floats) so results are
  bit-stable across platforms:
    - headings (h1..h6): keep if non-empty
    - li:  keep if 2*link_chars <= total_chars
    - else: keep if 3*link_chars <= total_chars
* Rendering (the markdown re-assembly spec, analog of
  `utils/common.py:83-120`): h1->'# ', h2->'## ', ... h6->'###### ',
  li->'- ', everything else bare; kept blocks joined with '\n\n'.
* ``title`` = text of the first kept heading in document order (top-1
  in document order, analog of `utils/common.py:66-81`).
* Errors never raise: the kernel returns an ``error`` string and null
  text (analog of the reference's log-and-continue policy,
  `notes/extractor.py:112-116`).
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

__all__ = [
    "extract_document",
    "extract_html",
    "extract_wdoc",
    "extract_pdf",
    "render_wdoc",
    "render_pdf",
    "KernelResult",
    "WDOC_MAGIC",
    "PDF_MAGIC",
]

WDOC_MAGIC = b"%WDOC1\n"
PDF_MAGIC = b"%PDF"

HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
BLOCK_TAGS = HEADING_TAGS | {
    "p", "li", "pre", "blockquote", "td", "th", "dt", "dd", "figcaption", "caption",
}
# Structural containers: they never hold rendered text themselves; text found
# directly inside them forms an "anonymous" block.
STRUCT_TAGS = {
    "html", "body", "div", "section", "article", "main", "ul", "ol", "table",
    "tbody", "thead", "tfoot", "tr", "dl", "figure", "details", "summary",
}
# Entire subtrees dropped: no blocks, no text, no ids.
DROP_TAGS = {
    "script", "style", "noscript", "svg", "head", "nav", "header", "footer",
    "aside", "form", "button", "select", "option", "iframe", "template",
    "object", "title",
}
VOID_TAGS = {
    "br", "img", "hr", "meta", "link", "input", "area", "base", "col",
    "embed", "source", "track", "wbr", "param",
}
# class/id tokens that mark boilerplate containers (Boilerpipe-style blacklist)
BOILER_TOKENS = {
    "nav", "menu", "sidebar", "footer", "header", "ad", "ads", "advert",
    "advertisement", "banner", "promo", "share", "social", "comment",
    "comments", "related", "breadcrumb", "breadcrumbs", "pagination",
    "widget", "cookie", "popup", "subscribe", "newsletter", "linkfarm",
}

_PREFIX = {"h1": "# ", "h2": "## ", "h3": "### ", "h4": "#### ",
           "h5": "##### ", "h6": "###### ", "li": "- "}


@dataclass
class _Block:
    tag: str
    path: str
    parts: list = field(default_factory=list)
    total_chars: int = 0  # non-whitespace chars
    link_chars: int = 0   # non-whitespace chars inside <a>


@dataclass
class KernelResult:
    url: str
    title: str | None
    text: str | None
    spans: list  # list of dicts {block_id, path, start, end}
    n_blocks: int
    error: str | None

    def sha256(self) -> str | None:
        if self.text is None:
            return None
        return hashlib.sha256(self.text.encode("utf-8")).hexdigest()


def _is_boiler_attrs(attrs) -> bool:
    for k, v in attrs:
        if k in ("class", "id") and v:
            for token in v.replace("-", " ").replace("_", " ").lower().split():
                if token in BOILER_TOKENS:
                    return True
    return False


class _Extractor(HTMLParser):
    """Event-stream DOM walk; document order == event order (html.parser
    preserves serialization order, like the reference's `findall`,
    `notes/extractor.py:62`)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # stack frames: [tag, is_boiler_root, child_counter, path]
        self.stack: list = []
        self.drop_depth = 0
        self.a_depth = 0
        self.pre_depth = 0
        self.block: _Block | None = None
        self.blocks: list = []      # finalized candidate blocks (kept & dropped)
        self.kept: list = []        # (block_id, tag, path, rendered_text)
        self.next_id = 0
        self.root_children = 0

    # -- path helpers -------------------------------------------------
    def _child_ordinal(self) -> int:
        if self.stack:
            self.stack[-1][2] += 1
            return self.stack[-1][2]
        self.root_children += 1
        return self.root_children

    def _parent_path(self) -> str:
        return self.stack[-1][3] if self.stack else ""

    def _path_for(self, tag: str, ordinal: int) -> str:
        parent = self._parent_path()
        comp = f"{tag}:{ordinal}"
        return f"{parent}>{comp}" if parent else comp

    # -- block lifecycle ----------------------------------------------
    def _open_block(self, tag: str, path: str) -> None:
        self._flush_block()
        self.block = _Block(tag=tag, path=path)

    def _flush_block(self) -> None:
        b = self.block
        self.block = None
        if b is None:
            return
        raw = "".join(b.parts)
        # corpus hygiene: drop C0 control chars (NUL etc.) except the
        # whitespace ones the collapse/pre rules handle
        if not raw.isprintable():
            raw = "".join(c for c in raw
                          if ord(c) >= 32 or c in "\n\t\r\f\v")
        if b.tag == "pre":
            text = raw.strip()
        else:
            text = " ".join(raw.split())
        block_id = self.next_id
        self.next_id += 1
        self.blocks.append(b)
        if not text:
            return
        if b.tag in HEADING_TAGS:
            keep = True
        elif b.tag == "li":
            keep = 2 * b.link_chars <= b.total_chars
        else:
            keep = 3 * b.link_chars <= b.total_chars
        if keep:
            self.kept.append((block_id, b.tag, b.path, text))

    # -- parser events -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            if self.block is not None and tag == "br":
                self.block.parts.append("\n" if self.pre_depth else " ")
            return
        boiler = False
        if self.drop_depth == 0:
            boiler = tag in DROP_TAGS or (bool(attrs)
                                          and _is_boiler_attrs(attrs))
        if self.drop_depth > 0 or boiler:
            self._flush_block()
            self.drop_depth += 1
            self.stack.append([tag, True, 0, self._parent_path()])
            return
        ordinal = self._child_ordinal()
        path = self._path_for(tag, ordinal)
        if tag == "a":
            self.a_depth += 1
        if tag in BLOCK_TAGS:
            self._open_block(tag, path)
            if tag == "pre":
                self.pre_depth += 1
        elif tag in STRUCT_TAGS:
            self._flush_block()
        # inline tags: keep current block open, text flows through
        self.stack.append([tag, False, 0, path])

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # fast path: well-formed HTML closes the top of stack
        if self.stack and self.stack[-1][0] == tag:
            depth = len(self.stack) - 1
        else:
            # pop to the matching open tag if present (lenient recovery
            # keeps ordering stable under malformed HTML)
            depth = None
            for i in range(len(self.stack) - 1, -1, -1):
                if self.stack[i][0] == tag:
                    depth = i
                    break
            if depth is None:
                return  # stray end tag: ignore
        while len(self.stack) > depth:
            frame = self.stack.pop()
            ftag, fboiler = frame[0], frame[1]
            if fboiler:
                self.drop_depth -= 1
                continue
            if ftag == "a":
                self.a_depth -= 1
            if ftag in BLOCK_TAGS:
                if ftag == "pre":
                    self.pre_depth -= 1
                self._flush_block()
            elif ftag in STRUCT_TAGS:
                self._flush_block()

    def handle_data(self, data):
        if self.drop_depth > 0:
            return
        if not data:
            return
        if self.block is None:
            if not data.strip():
                return
            # anonymous block: bare text directly inside a structural tag
            self.block = _Block(tag="text", path=self._parent_path() + ">#text"
                                if self._parent_path() else "#text")
        self.block.parts.append(data)
        # non-whitespace char count; str.split() uses the same unicode
        # whitespace class as isspace() but runs in C (~40% of kernel
        # time went to a per-char generator here)
        n = sum(map(len, data.split()))
        self.block.total_chars += n
        if self.a_depth > 0:
            self.block.link_chars += n

    def close(self):
        super().close()
        self._flush_block()


def _assemble(url: str, kept: list) -> KernelResult:
    """Deterministic serialization: render prefixes, join '\n\n', compute
    spans over the final text (invariant: text[start:end] == rendered)."""
    title = None
    pieces = []
    spans = []
    pos = 0
    for block_id, tag, path, text in kept:
        rendered = _PREFIX.get(tag, "") + text
        if title is None and tag in HEADING_TAGS:
            title = text
        if pieces:
            pos += 2  # the '\n\n' separator
        spans.append({"block_id": block_id, "path": path,
                      "start": pos, "end": pos + len(rendered)})
        pos += len(rendered)
        pieces.append(rendered)
    return KernelResult(url=url, title=title, text="\n\n".join(pieces),
                        spans=spans, n_blocks=len(kept), error=None)


# ---------------------------------------------------------------------------
# Fast tokenizer: a single-pass scanner that drives the SAME _Extractor
# handlers as html.parser (classification logic stays single-sourced).
# ~2x the stdlib parser, which spends >half its time in per-event regex
# bookkeeping (goahead/updatepos/parse_starttag — see bench notes).
# Behavior contract: byte-identical output to the stdlib engine — pinned
# by tests/test_kernel.py differential tests over every fixture class,
# the bulk corpus, and hypothesis-generated tag soup. The three
# tolerant-parsing regexes mirror html.parser's (CPython, PSF license).
# ---------------------------------------------------------------------------

from html import unescape as _unescape  # noqa: E402 (single import point)

_STARTTAG_END = re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*        # tag name
  (?:[\s/]*                           # optional whitespace before attr name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*   # attribute name
      (?:\s*=+\s*                     # value indicator
        (?:'[^']*'                    # LITA-enclosed value
          |"[^"]*"                    # LIT-enclosed value
          |(?!['"])[^>\s]*            # bare value
        )
        (?:\s*,)*                     # possibly followed by a comma
      )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                 # trailing whitespace
""", re.VERBOSE)
_ATTRFIND = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_ENDTAG = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_TAGNAME = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_CDATA_CLOSE = {
    "script": re.compile(r"</\s*script", re.I),
    "style": re.compile(r"</\s*style", re.I),
}


def _fast_feed(p: "_Extractor", s: str) -> None:
    """Tokenize ``s`` and emit handle_starttag/endtag/data events with
    html.parser(convert_charrefs=True) semantics."""
    i, n = 0, len(s)
    find = s.find
    while i < n:
        lt = find("<", i)
        if lt < 0:
            p.handle_data(_unescape(s[i:]))
            break
        if lt > i:
            p.handle_data(_unescape(s[i:lt]))
        i = lt
        nxt = s[lt + 1:lt + 2]
        if nxt and (nxt.isascii() and nxt.isalpha()):
            # faithful port of html.parser's check_for_whole_start_tag
            # + parse_starttag endgame (which chars end the tag, when
            # '/>' means self-closing vs a bare attr value, raw-data
            # fallback on a malformed tail)
            m = _STARTTAG_END.match(s, lt)
            j = m.end()
            after = s[j:j + 1]
            if after == ">":
                endpos = j + 1
            elif after == "/" and s.startswith("/>", j):
                endpos = j + 2
            elif after == "" or after == "/" or after == "=" or \
                    (after.isascii() and after.isalpha()):
                i = _emit_bogus(p, s, lt)   # EOF-truncated start tag
                continue
            else:
                endpos = j                   # malformed tail: no '>'
            tm = _TAGNAME.match(s, lt + 1)
            tag = tm.group(1).lower()
            attrs = []
            k = tm.end()
            while k < endpos:
                am = _ATTRFIND.match(s, k)
                if not am or am.end() == am.start():
                    break
                name, rest, value = am.group(1, 2, 3)
                if not rest:
                    value = None
                elif value[:1] == "'" == value[-1:] or \
                        value[:1] == '"' == value[-1:]:
                    value = value[1:-1]
                if value:
                    value = _unescape(value)
                attrs.append((name.lower(), value))
                k = am.end()
            tail = s[k:endpos].strip()
            if tail not in (">", "/>"):
                p.handle_data(s[lt:endpos])  # raw, like parse_starttag
                i = endpos
                continue
            if tail == "/>":
                p.handle_startendtag(tag, attrs)
                i = endpos
                continue
            p.handle_starttag(tag, attrs)
            i = endpos
            if tag in _CDATA_CLOSE:      # raw-text elements
                cm = _CDATA_CLOSE[tag].search(s, i)
                if cm is None:
                    if i < n:
                        p.handle_data(s[i:])  # raw, no unescape
                    break
                if cm.start() > i:
                    p.handle_data(s[i:cm.start()])
                em = _ENDTAG.match(s, cm.start())
                if em:
                    p.handle_endtag(em.group(1).lower())
                    i = em.end()
                else:
                    gt = find(">", cm.start())
                    p.handle_endtag(tag)
                    i = n if gt < 0 else gt + 1
        elif nxt == "/":
            em = _ENDTAG.match(s, lt)
            if em:
                p.handle_endtag(em.group(1).lower())
                i = em.end()
                continue
            gt = find(">", lt + 2)
            if gt < 0:
                i = _emit_bogus(p, s, lt)
                continue
            tm = _TAGNAME.match(s, lt + 2)
            if tm:                        # junk-tolerant end tag </tag junk>
                p.handle_endtag(tm.group(1).lower())
            # else: bogus comment ("</>"
            #  or "</ ...>") — ignored, no handler
            i = gt + 1
        elif nxt == "!":
            if s.startswith("<!--", lt):
                j = find("-->", lt + 4)
                if j < 0:
                    i = _emit_bogus(p, s, lt)
                    continue
                i = j + 3                 # comment: ignored
            else:
                gt = find(">", lt + 2)
                if gt < 0:
                    i = _emit_bogus(p, s, lt)
                    continue
                i = gt + 1                # declaration/bogus: ignored
        elif nxt == "?":
            gt = find(">", lt + 2)
            if gt < 0:
                i = _emit_bogus(p, s, lt)
                continue
            i = gt + 1                    # processing instr: ignored
        else:
            p.handle_data("<")            # lone '<' is text
            i = lt + 1
    p._flush_block()


def _emit_bogus(p: "_Extractor", s: str, i: int) -> int:
    """EOF-truncated construct: html.parser's close() emits it as data
    up to the next '>'+1, else the next '<', else one char."""
    k = s.find(">", i + 1)
    if k >= 0:
        k += 1
    else:
        k = s.find("<", i + 1)
        if k < 0:
            k = i + 1
    p.handle_data(_unescape(s[i:k]))
    return k


def extract_html(url: str, html_text: str,
                 engine: str = "fast") -> KernelResult:
    parser = _Extractor()
    if engine == "fast":
        _fast_feed(parser, html_text)
    else:                                 # stdlib reference engine
        parser.feed(html_text)
        parser.close()
    return _assemble(url, parser.kept)


# ---------------------------------------------------------------------------
# WDOC: the deterministic binary layout format (stand-in for the reference's
# PPTX->PDF binary path, slides/extractor.py:38-109; we control the payload
# format, see FIXTURES.md §1). Layout parse = decode blocks, sort by (y, x,
# input order), render with the same block rules.
# ---------------------------------------------------------------------------

def render_wdoc(blocks) -> bytes:
    """blocks: iterable of (role, y, x, text); text must not contain \\t or \\n
    (they are escaped)."""
    out = [WDOC_MAGIC.decode("ascii")]
    rows = list(blocks)
    out.append(f"{len(rows)}\n")
    for role, y, x, text in rows:
        esc = text.replace("\\", "\\\\").replace("\n", "\\n").replace("\t", "\\t")
        out.append(f"{role}\t{y}\t{x}\t{esc}\n")
    return "".join(out).encode("utf-8")


def _unescape_wdoc(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            out.append({"n": "\n", "t": "\t", "\\": "\\"}.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def extract_wdoc(url: str, payload: bytes) -> KernelResult:
    body = payload[len(WDOC_MAGIC):].decode("utf-8")
    lines = body.split("\n")
    n = int(lines[0])
    recs = []
    for idx in range(1, n + 1):
        role, y, x, text = lines[idx].split("\t", 3)
        if role not in _PREFIX and role != "p":
            raise ValueError(f"wdoc: unknown role {role!r}")
        recs.append((int(y), int(x), idx - 1, role, _unescape_wdoc(text)))
    recs.sort(key=lambda r: (r[0], r[1], r[2]))
    kept = []
    for block_id, (y, x, _i, role, text) in enumerate(recs):
        text = " ".join(text.split())
        if text:
            kept.append((block_id, role, f"wdoc:y{y}:x{x}", text))
    return _assemble(url, kept)


# ---------------------------------------------------------------------------
# PDF: pdfminer-style layout parse of a minimal-but-real PDF 1.4 subset
# (the reference's PPTX->PDF binary path, slides/extractor.py:38-109,
# re-expressed as an in-process parse — no subprocess per row, no
# external pdf libs in this environment). The *renderer* below writes
# honest PDF bytes (catalog/pages/page/contents objects, correct xref
# offsets, uncompressed content streams); the *parser* reads content
# streams with a small operand-stack tokenizer over the standard text
# operators (Tf/Td/TD/Tm/T*/Tj/TJ), reconstructs layout order by
# (page, top-down y, left-right x, stream order), and maps font size to
# heading level — the classic pdfminer/Boilerpipe layout heuristic.
#
# Frozen role contract (goldens pin it): font /F2 => li; /F1 size
# >=24 h1, >=20 h2, >=18 h3, >=16 h4, >=15 h5, >=14 h6, else p.
# Strings are PDF literal strings; bytes outside printable ASCII are
# octal-escaped by the renderer and the parser decodes octal + the
# standard \n \r \t \b \f \( \) \\ escapes, then UTF-8-decodes.
# Subset note: literal strings with *unescaped* nested parens are not
# supported (our renderer always escapes them).
# ---------------------------------------------------------------------------

PDF_PAGE_H = 792  # US-Letter height in points; device y points up

_PDF_ROLE_SIZE = {"h1": 24, "h2": 20, "h3": 18, "h4": 16, "h5": 15,
                  "h6": 14, "p": 12, "li": 12}


def _pdf_role_for_font(name: str, size: float) -> str:
    if name == "F2":
        return "li"
    for role in ("h1", "h2", "h3", "h4", "h5", "h6"):
        if size >= _PDF_ROLE_SIZE[role]:
            return role
    return "p"


def _pdf_escape(text: str) -> str:
    """UTF-8 bytes -> PDF literal-string body (latin-1-safe str)."""
    out = []
    for b in text.encode("utf-8"):
        if b in (0x28, 0x29, 0x5C):          # ( ) backslash
            out.append("\\" + chr(b))
        elif 32 <= b < 127:
            out.append(chr(b))
        else:
            out.append(f"\\{b:03o}")
    return "".join(out)


def _pdf_unescape(s: str) -> bytes:
    """PDF literal-string body (latin-1 chars) -> raw bytes."""
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(ord(c))
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = s[i + 1]
        if nxt in "nrtbf":
            out.append({"n": 10, "r": 13, "t": 9, "b": 8, "f": 12}[nxt])
            i += 2
        elif nxt in "()\\":
            out.append(ord(nxt))
            i += 2
        elif nxt in "01234567":
            j = i + 1
            digits = ""
            while j < n and len(digits) < 3 and s[j] in "01234567":
                digits += s[j]
                j += 1
            out.append(int(digits, 8) & 0xFF)
            i = j
        else:                                 # line continuation etc.
            i += 2
    return bytes(out)


def render_pdf(blocks) -> bytes:
    """blocks: iterable of (role, y, x, text) with y measured from the
    page top (same convention as render_wdoc). Emits a complete valid
    single-page PDF 1.4 with a correct xref table."""
    parts = []
    for role, y, x, text in blocks:
        if role not in _PDF_ROLE_SIZE:
            raise ValueError(f"pdf: unknown role {role!r}")
        font = "F2" if role == "li" else "F1"
        size = _PDF_ROLE_SIZE[role]
        parts.append(f"BT /{font} {size} Tf {int(x)} {PDF_PAGE_H - int(y)} Td "
                     f"({_pdf_escape(text)}) Tj ET")
    content = "\n".join(parts).encode("latin-1")
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R /F2 6 0 R "
         b">> >> >>"),
        (b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
         + content + b"\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>",
    ]
    buf = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    return bytes(buf)


_PDF_TOKEN = re.compile(
    r"\((?P<str>(?:\\.|[^\\()])*)\)"      # literal string (escaped parens)
    r"|/(?P<name>[^\s/()<>\[\]{}%]+)"     # name
    r"|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"  # number
    r"|(?P<arr>[\[\]])"                   # array delimiters (TJ)
    r"|(?P<op>[A-Za-z'\"][A-Za-z0-9*'\"]{0,2})")  # operator


def _pdf_parse_content(stream: str):
    """Yield (font_name, size, x, y_dev, text_bytes) per BT..ET block
    that shows text. Operand-stack walk of the text operators; Td/TD
    accumulate (real PDF line-move semantics), Tm sets absolutely."""
    font, size = "F1", 12.0
    x = y = 0.0
    stack: list = []
    shown: list = []
    in_bt = False
    for m in _PDF_TOKEN.finditer(stream):
        kind = m.lastgroup
        if kind == "str":
            stack.append(("s", m.group("str")))
        elif kind == "name":
            stack.append(("n", m.group("name")))
        elif kind == "num":
            stack.append(("f", float(m.group("num"))))
        elif kind == "arr":
            continue                     # TJ arrays: strings stay on stack
        else:
            op = m.group("op")
            if op == "BT":
                in_bt, x, y = True, 0.0, 0.0
                shown, stack = [], []
            elif op == "ET":
                if in_bt and shown:
                    yield (font, size, x, y,
                           b"".join(_pdf_unescape(s) for s in shown))
                in_bt, shown, stack = False, [], []
            elif op == "Tf" and len(stack) >= 2:
                if stack[-1][0] == "f" and stack[-2][0] == "n":
                    font, size = stack[-2][1], stack[-1][1]
                stack = []
            elif op in ("Td", "TD") and len(stack) >= 2:
                if stack[-1][0] == "f" and stack[-2][0] == "f":
                    x += stack[-2][1]
                    y += stack[-1][1]
                stack = []
            elif op == "Tm" and len(stack) >= 6:
                if stack[-1][0] == "f" and stack[-2][0] == "f":
                    x, y = stack[-2][1], stack[-1][1]
                stack = []
            elif op == "Tj":
                if stack and stack[-1][0] == "s":
                    shown.append(stack[-1][1])
                stack = []
            elif op == "TJ":
                shown.extend(v for t, v in stack if t == "s")
                stack = []
            elif op == "T*":
                stack = []
            else:                        # any other operator clears operands
                stack = []


def extract_pdf(url: str, payload: bytes) -> KernelResult:
    data = payload.decode("latin-1")
    streams = re.findall(r"stream\r?\n(.*?)\s*endstream", data, re.S)
    recs = []
    order = 0
    for pg, body in enumerate(streams):
        if "BT" not in body:
            continue
        for fname, fsize, bx, by, text_bytes in _pdf_parse_content(body):
            y_top = int(round(PDF_PAGE_H - by))
            recs.append((pg, y_top, int(round(bx)), order,
                         _pdf_role_for_font(fname, fsize),
                         text_bytes.decode("utf-8")))
            order += 1
    recs.sort(key=lambda r: (r[0], r[1], r[2], r[3]))
    kept = []
    for block_id, (pg, y, x, _o, role, text) in enumerate(recs):
        text = " ".join(text.split())
        if text:
            kept.append((block_id, role, f"pdf:pg{pg}:y{y}:x{x}", text))
    return _assemble(url, kept)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

def _error_result(url: str, error: str) -> KernelResult:
    return KernelResult(url=url, title=None, text=None, spans=[],
                        n_blocks=0, error=error)


def extract_document(url: str, content: bytes | None,
                     fallback_text: str | None = None) -> KernelResult:
    """Extract one document. Never raises.

    ``fallback_text`` mirrors the reference's dual-path preference merge
    (`notes/extractor.py:171-174`): it is NOT used here — the pipeline
    exposes it as a separate column and coalesces downstream (J2).
    """
    if content is None:
        return _error_result(url, "null_content")
    try:
        if content.startswith(WDOC_MAGIC):
            return extract_wdoc(url, content)
        if content.startswith(PDF_MAGIC):
            return extract_pdf(url, content)
        return extract_html(url, content.decode("utf-8"))
    except UnicodeDecodeError as exc:
        return _error_result(url, f"decode_error: {exc.reason}")
    except Exception as exc:  # noqa: BLE001 — log-and-continue policy (F6)
        return _error_result(url, f"{type(exc).__name__}: {exc}")
