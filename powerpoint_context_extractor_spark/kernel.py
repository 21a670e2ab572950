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

* Input is raw bytes. ``%WDOC1`` magic routes to the layout parser (the
  analog of the reference's PPTX->PDF->image binary path,
  `slides/extractor.py:38-109`, re-expressed as an in-process parse —
  never a subprocess per row). ``%PDF`` is a clearly-marked stub (real
  pdf decode libs are not in this environment). Everything else is
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
from dataclasses import dataclass, field
from html.parser import HTMLParser

__all__ = [
    "extract_document",
    "extract_html",
    "extract_wdoc",
    "render_wdoc",
    "KernelResult",
    "WDOC_MAGIC",
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


def extract_html(url: str, html_text: str) -> KernelResult:
    parser = _Extractor()
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
            # STUB: real PDF decode needs pdfminer/poppler, absent in this
            # environment. The Spark-side plumbing (binary column, schema,
            # batching) is real; only the decoder is stubbed.
            return _error_result(url, "unsupported_binary:pdf")
        return extract_html(url, content.decode("utf-8"))
    except UnicodeDecodeError as exc:
        return _error_result(url, f"decode_error: {exc.reason}")
    except Exception as exc:  # noqa: BLE001 — log-and-continue policy (F6)
        return _error_result(url, f"{type(exc).__name__}: {exc}")
