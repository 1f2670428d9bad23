"""From-scratch HTML → markdown main-content extraction.

This is the capability the reference does NOT have (it OCRs pixels);
north_star requires a native HTML path: "a pandas/Arrow UDF stage
tokenizes HTML byte streams, strips boilerplate via text-density and
link-density DOM heuristics".  The heuristics here are the classic
public ones (Boilerpipe, Kohlschütter et al. 2010; jusText, Pomikálek
2011): segment the DOM into text blocks, score each block by link
density and length, drop navigation/ad/footer blocks, and render the
survivors as markdown.

Pure Python on purpose: byte-identity of the extracted text is the
engine's correctness contract, so the same function runs inside the
Spark pipeline (Arrow-batched, one call per ~4k rows) and inside the
single-process oracle.

Scale: a pure ``bytes -> str`` function with no shared state — the
stage is embarrassingly parallel, keyed by nothing, and preserves the
upstream partitioning (no shuffle).  At 100 TB the only knob is
partition sizing, handled in ``extractor.pipeline``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Block-level elements that terminate/emit a text block.
_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_BLOCK_TAGS = {"p", "li", "pre", "blockquote", "div", "section", "article",
               "main", "ul", "ol", "table", "br"}
# Content inside these subtrees is ignored entirely.
_SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg"}
# Boilerplate context: blocks opened inside these subtrees are dropped
# unless they clear a much higher bar (jusText treats them as "bad"
# context).
_BOILER_TAGS = {"nav", "aside", "footer", "header", "menu", "form"}

# A block whose link density exceeds this is boilerplate (Boilerpipe's
# densitometric classifier uses ~0.33; we allow a little more prose
# around inline links).
LINK_DENSITY_MAX = 0.4
# Minimum characters for a non-heading block to be kept at all.
MIN_BLOCK_CHARS = 3

_WS_RE = re.compile(r"\s+")


class _Block:
    __slots__ = ("kind", "level", "parts", "link_chars", "boiler", "cells",
                 "header_row", "table_id", "_text")

    def __init__(self, kind: str, level: int = 0, boiler: bool = False,
                 table_id: int = 0):
        self.kind = kind          # 'p' | 'h' | 'li' | 'pre' | 'quote' | 'row'
        self.level = level        # heading level for 'h'
        self.parts: list[str] = []
        self.link_chars = 0
        self.boiler = boiler
        self.cells: list[str] = []   # for 'row'
        self.header_row = False      # row made of <th> cells
        self.table_id = table_id     # rows group per source table
        self._text: str | None = None

    @property
    def text(self) -> str:
        # Memoized: first read happens at _flush time, after which
        # parts never change; _keep and _render re-read it (the
        # whitespace regex was ~1/3 of total parse cost unmemoized).
        t = self._text
        if t is None:
            t = self._text = _WS_RE.sub(" ", "".join(self.parts)).strip()
        return t


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self.current: _Block | None = None
        self.skip_depth = 0
        self.boiler_depth = 0
        self.link_depth = 0
        self.cell_parts: list[str] | None = None
        self.in_th = False
        self.table_count = 0

    # -- block lifecycle ----------------------------------------------------
    def _flush(self) -> None:
        if self.current is not None:
            if self.current.kind == "row":
                cells = [c for c in self.current.cells]
                if any(c for c in cells):
                    self.blocks.append(self.current)
            elif self.current.text:
                self.blocks.append(self.current)
            self.current = None

    def _open(self, kind: str, level: int = 0) -> None:
        self._flush()
        self.current = _Block(
            kind, level, boiler=self.boiler_depth > 0, table_id=self.table_count
        )

    def _end_cell(self) -> None:
        if self.cell_parts is not None and self.current is not None:
            cell = _WS_RE.sub(" ", "".join(self.cell_parts)).strip()
            self.current.cells.append(cell)
            if self.in_th:
                self.current.header_row = True
        self.cell_parts = None
        self.in_th = False

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag in _BOILER_TAGS:
            if self.cell_parts is None:
                # flush FIRST: text already in the open block was
                # authored outside the boiler subtree and must not be
                # classified (or concatenated) with what follows
                self._flush()
            self.boiler_depth += 1
            return
        if self.cell_parts is not None:
            # Inside a table cell, block structure is flattened into
            # the cell text (real-world <td><p>…</p></td> is routine);
            # only links, cell/row boundaries and NESTED TABLES are
            # structural.
            if tag == "a":
                self.link_depth += 1
            elif tag == "table":
                # A table opened inside a cell: close the partial cell
                # (its accumulated text stays on the outer row) and
                # bump table_count so the nested rows form their OWN
                # markdown table instead of silently merging into the
                # outer one with the outer table_id.
                self._end_cell()
                self.table_count += 1
            elif tag in ("tr", "td", "th"):
                # malformed html: new cell/row without closing </td>
                self._end_cell()
                if tag == "tr":
                    self._open("row")
                else:
                    if self.current is None or self.current.kind != "row":
                        self._open("row")
                    self.cell_parts = []
                    self.in_th = tag == "th"
            elif tag in _BLOCK_TAGS or tag in _HEADINGS:
                self.cell_parts.append(" ")
            return
        if tag == "table":
            self.table_count += 1
            self._flush()
        elif tag in _HEADINGS:
            self._open("h", _HEADINGS[tag])
        elif tag == "p":
            self._open("p")
        elif tag == "li":
            self._open("li")
        elif tag == "pre":
            self._open("pre")
        elif tag == "blockquote":
            self._open("quote")
        elif tag == "tr":
            self._open("row")
        elif tag in ("td", "th"):
            if self.current is None or self.current.kind != "row":
                self._open("row")
            self.cell_parts = []
            self.in_th = tag == "th"
        elif tag == "a":
            self.link_depth += 1
        elif tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag in _BOILER_TAGS:
            self.boiler_depth = max(0, self.boiler_depth - 1)
            if self.cell_parts is None:
                self._flush()
            return
        if self.cell_parts is not None:
            if tag in ("td", "th"):
                self._end_cell()
            elif tag == "tr":
                self._end_cell()
                self._flush()
            elif tag == "a":
                self.link_depth = max(0, self.link_depth - 1)
            elif tag == "table":
                # empty/text-only nested table closing inside a cell:
                # bump so rows after it never share its group id
                self.table_count += 1
                self.cell_parts.append(" ")
            elif tag in _BLOCK_TAGS or tag in _HEADINGS:
                self.cell_parts.append(" ")
            return
        if tag in ("td", "th"):
            self._end_cell()
        elif tag == "a":
            self.link_depth = max(0, self.link_depth - 1)
        elif tag == "table":
            # bump on close too: outer-table rows emitted AFTER a
            # nested table must not adopt the nested group's id (only
            # adjacent-row equality matters, so extra bumps are safe)
            self.table_count += 1
            self._flush()
        elif tag in _HEADINGS or tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self.skip_depth or not data:
            return
        if self.cell_parts is not None:
            self.cell_parts.append(data)
            return
        if self.current is None:
            if not data.strip():
                return
            self._open("p")
        self.current.parts.append(data)
        if self.link_depth:
            self.current.link_chars += len(data.strip())


def _keep(block: _Block) -> bool:
    """Boilerplate classifier (text-density / link-density heuristic)."""
    if block.kind == "row":
        return not block.boiler
    text = block.text
    if len(text) < MIN_BLOCK_CHARS:
        return False
    if block.boiler:
        return False
    if block.kind != "h":
        density = block.link_chars / max(len(text), 1)
        if density > LINK_DENSITY_MAX:
            return False
    return True


def _render(blocks: list[_Block]) -> str:
    out: list[str] = []
    prev_table: int | None = None  # table_id of an open row group
    group_first = False            # next row is its group's first
    for b in blocks:
        if b.kind == "row":
            line = "| " + " | ".join(b.cells) + " |"
            if prev_table == b.table_id:
                out[-1] = out[-1] + "\n" + line
                group_first = False
            else:
                # rows from a DIFFERENT table (even adjacent after
                # dropped boilerplate) start their own markdown table
                out.append(line)
                group_first = True
            if b.header_row and group_first:
                # the |---| separator is a header marker; mid-table th
                # rows must not re-emit it
                out[-1] = out[-1] + "\n|" + " --- |" * len(b.cells)
            prev_table = b.table_id
            continue
        prev_table = None
        if b.kind == "h":
            out.append("#" * b.level + " " + b.text)
        elif b.kind == "li":
            out.append("- " + b.text)
        elif b.kind == "quote":
            out.append("> " + b.text)
        elif b.kind == "pre":
            # preformatted content keeps its own whitespace, fenced
            raw = "".join(b.parts).strip("\n")
            out.append("```\n" + raw + "\n```")
        else:
            out.append(b.text)
    # consecutive list items group into one block
    merged: list[str] = []
    for chunk in out:
        if merged and chunk.startswith("- ") and merged[-1].startswith("- "):
            merged[-1] = merged[-1] + "\n" + chunk
        else:
            merged.append(chunk)
    return "\n\n".join(merged)


class _LinkCollector(HTMLParser):
    """Collect every ``<a href>`` with its whitespace-normalized anchor
    text, in document order.  Unlike the main-content extractor this
    keeps boilerplate regions — the outlink graph WANTS nav/footer
    edges — and skips only non-content subtrees (script/style/…)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str, bool]] = []
        self.skip_depth = 0
        self._href: str | None = None
        self._nofollow = False
        self._parts: list[str] = []

    def _finish(self) -> None:
        if self._href is not None:
            text = _WS_RE.sub(" ", "".join(self._parts)).strip()
            self.links.append((self._href, text, self._nofollow))
            self._href = None
            self._nofollow = False
            self._parts = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "a":
            self._finish()  # malformed html: new <a> closes the open one
            ad = dict(attrs)
            href = ad.get("href")
            if href:
                self._href = href
                # rel is a space-separated token list per the HTML spec
                self._nofollow = "nofollow" in (ad.get("rel") or "").lower().split()
                self._parts = []

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "a":
            self._finish()

    def handle_data(self, data):
        if self.skip_depth or self._href is None:
            return
        self._parts.append(data)


def extract_links_rel(html: bytes | str) -> list[tuple[str, str, bool]]:
    """(href, anchor_text, nofollow) triples in document order — the
    edge list a web-graph build consumes, with the ``rel="nofollow"``
    token surfaced so rank propagation can exclude edges the linking
    page explicitly disavows (the attribute's defined purpose).
    Deterministic, pure; shared by the Spark operator
    (operators.webgraph.html_outlinks) and the SQL oracle's
    expectations."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _LinkCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    parser._finish()
    return parser.links


def extract_links(html: bytes | str) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs in document order — the original
    2-tuple surface, kept for callers that don't care about rel."""
    return [(h, t) for h, t, _ in extract_links_rel(html)]


def html_to_markdown(html: bytes | str) -> str:
    """Extract main content from an HTML byte stream as markdown.

    Deterministic, pure; shared verbatim by the Spark pipeline and the
    oracle.  Decoding is utf-8 with replacement (Common-Crawl reality:
    mislabeled encodings must not kill a task).
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _Extractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # html.parser is tolerant; anything that still raises is data,
        # not a task failure (reference pattern: errors are data,
        # pdf_processor.py:228-247).
        pass
    parser._flush()
    return _render([b for b in parser.blocks if _keep(b)])


class _MetadataCollector(HTMLParser):
    """Collect page-level metadata from the document head (and body,
    for the malformed pages that put head tags there): <title>,
    <meta name=description>, <link rel=canonical>, <html lang>,
    <meta property=og:title>.  First occurrence wins per field —
    browsers honor the first <title>; duplicated meta is spam."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, str | None] = {
            "title": None, "description": None, "canonical": None,
            "lang": None, "og_title": None,
        }
        self._title_parts: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        ad = {k.lower(): (v or "") for k, v in attrs}
        if tag == "html" and self.meta["lang"] is None and ad.get("lang"):
            self.meta["lang"] = ad["lang"].strip()
        elif tag == "title" and self.meta["title"] is None:
            self._title_parts = []
        elif tag == "meta":
            name = ad.get("name", "").lower()
            prop = ad.get("property", "").lower()
            content = ad.get("content")
            if content is None:
                return
            if name == "description" and self.meta["description"] is None:
                self.meta["description"] = _WS_RE.sub(" ", content).strip()
            elif prop == "og:title" and self.meta["og_title"] is None:
                self.meta["og_title"] = _WS_RE.sub(" ", content).strip()
        elif tag == "link":
            rel = ad.get("rel", "").lower().split()
            if "canonical" in rel and self.meta["canonical"] is None:
                href = ad.get("href", "").strip()
                if href:
                    self.meta["canonical"] = href

    def handle_endtag(self, tag):
        if tag == "title" and self._title_parts is not None:
            self.meta["title"] = _WS_RE.sub(
                " ", "".join(self._title_parts)
            ).strip()
            self._title_parts = None

    def handle_data(self, data):
        if self._title_parts is not None:
            self._title_parts.append(data)


def extract_metadata(html: bytes | str) -> dict[str, str | None]:
    """Page-level metadata dict (title, description, canonical, lang,
    og_title; None where absent) — the index/display fields an
    extraction pipeline ships alongside the markdown body.
    Deterministic, pure; shared by the Spark operator
    (operators.metadata.page_metadata) and pinned against the
    registry oracle's planted ground truth."""
    if html is None:
        return dict.fromkeys(
            ("title", "description", "canonical", "lang", "og_title")
        )
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _MetadataCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass
    if parser._title_parts is not None:  # unclosed <title>
        parser.meta["title"] = _WS_RE.sub(
            " ", "".join(parser._title_parts)
        ).strip()
    return parser.meta
