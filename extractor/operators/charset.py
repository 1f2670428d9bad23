"""Charset sniffing + decoding for raw HTML byte streams.

The input table carries ``html: binary`` (BASELINE input_hint) and a
real crawl is far from all-UTF-8: legacy windows-1252/latin-1, CJK
encodings, and pages that LIE about their encoding.  Decoding with
the wrong charset silently corrupts every downstream stage (dedup
digests, quality scores, the extracted markdown itself), so the
charset decision is a first-class, testable operator — not a
hard-coded ``decode('utf-8')``.

Sniffing follows the WHATWG encoding-detection order, simplified to
its deterministic core:

1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE) — always wins;
2. the transport layer's ``Content-Type: …; charset=…`` parameter;
3. an HTML5 prescan of the first ``PRESCAN_BYTES`` bytes for
   ``<meta charset=…>`` or ``<meta http-equiv=content-type
   content="…charset=…">``;
4. default ``utf-8``.

Labels normalize through the WHATWG alias table (``iso-8859-1`` /
``latin-1`` / ``us-ascii`` are windows-1252 in every real browser);
unknown labels and undecodable bytes fall back to UTF-8 with
replacement — one mislabeled page must never kill a 100 TB job.

Scale shape: one Arrow-batched ``mapInPandas`` pass (decode is
per-row Python by necessity — charset varies per row, which the
JVM-side ``decode(col, charset)`` cannot express) — map-only, no
shuffle, rides the same scan as extraction.
"""

from __future__ import annotations

import codecs
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PRESCAN_BYTES = 1024

#: WHATWG label → python codec (the aliases browsers actually apply).
CHARSET_ALIASES = {
    "iso-8859-1": "windows-1252",
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "us-ascii": "windows-1252",
    "ascii": "windows-1252",
    "shift-jis": "shift_jis",
    "sjis": "shift_jis",
    "gb2312": "gbk",
    "utf8": "utf-8",
}

_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([\w.:-]+)""",
                              re.IGNORECASE)
_CTYPE_CHARSET_RE = re.compile(r"charset\s*=\s*\"?([\w.:-]+)", re.IGNORECASE)


def normalize_charset(label: str | None) -> str | None:
    """WHATWG-alias-normalized python codec name for ``label``;
    None if the label is empty or names no known codec."""
    if not label:
        return None
    label = label.strip().strip('"').strip("'").lower()
    label = CHARSET_ALIASES.get(label, label)
    try:
        return codecs.lookup(label).name
    except LookupError:
        return None


def sniff_charset(payload: bytes | None, content_type: str | None = None) -> str:
    """Detected charset for an HTML byte payload: BOM, then the
    Content-Type parameter, then an HTML5 meta prescan of the first
    ``PRESCAN_BYTES`` bytes, then utf-8.  Always returns a decodable
    codec name."""
    if payload is None:
        return "utf-8"
    payload = bytes(payload)
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if payload[:2] == b"\xff\xfe":
        return "utf-16-le"
    if payload[:2] == b"\xfe\xff":
        return "utf-16-be"
    if content_type:
        m = _CTYPE_CHARSET_RE.search(content_type)
        if m:
            cs = normalize_charset(m.group(1))
            if cs:
                return cs
    m = _META_CHARSET_RE.search(payload[:PRESCAN_BYTES])
    if m:
        cs = normalize_charset(m.group(1).decode("ascii", errors="replace"))
        if cs:
            return cs
    return "utf-8"


def decode_html(payload: bytes | None, charset: str) -> str | None:
    """Decode ``payload`` with ``charset``, errors replaced (a page
    lying about its encoding yields U+FFFD, not a dead task); BOM
    bytes are stripped so they never leak into the text."""
    if payload is None:
        return None
    payload = bytes(payload)
    if payload[:3] == b"\xef\xbb\xbf":
        payload = payload[3:]
    elif payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        payload = payload[2:]
    try:
        return payload.decode(charset, errors="replace")
    except LookupError:
        return payload.decode("utf-8", errors="replace")


def decode_pages(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    ctype_col: str | None = None,
) -> DataFrame:
    """(url, charset, text) per page: sniff + decode in one
    Arrow-batched map-only pass.  ``ctype_col`` optionally feeds the
    transport-layer Content-Type parameter into the sniff (the WARC
    reader's ``content_type`` column carries it)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = getattr(r, html_col)
                ctype = getattr(r, ctype_col) if ctype_col else None
                cs = sniff_charset(payload, ctype)
                rows.append((getattr(r, url_col), cs,
                             decode_html(payload, cs)))
            yield pd.DataFrame(rows, columns=["url", "charset", "text"])

    cols = [F.col(url_col), F.col(html_col)]
    if ctype_col:
        cols.append(F.col(ctype_col))
    return pages.select(*cols).mapInPandas(
        fn, schema="url string, charset string, text string"
    )


def normalize_pages_encoding(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Pages-table pass that re-encodes every payload as clean UTF-8
    (sniff → decode → encode), schema-preserving — the opt-in stage
    in front of ``run_extraction`` for corpora that carry legacy
    encodings (the pipeline itself decodes UTF-8-with-replacement;
    after this pass that decode is exact).  UTF-8 inputs round-trip
    byte-identical except BOM strip and U+FFFD for invalid bytes.
    One Arrow-batched map-only pass, no shuffle."""
    schema = pages.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[html_col] = [
                None
                if b is None
                else decode_html(b, sniff_charset(b)).encode("utf-8")
                for b in pdf[html_col]
            ]
            yield out

    return pages.mapInPandas(fn, schema=schema)


# Post-decode text hygiene: the control/combining residue a decode
# pass leaves behind.  Strip set is explicit (" \t\r\n") so the SQL
# oracle's trim() and Python's strip agree character-for-character.
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_HWS_RE = re.compile("[ \t]+")
_STRIP_CHARS = " \t\r\n"


def normalize_unicode(s: str | None) -> str | None:
    """NFC-compose, normalize line endings (CRLF and lone CR → LF —
    decode leaves Windows/Mac endings that would split line-grain
    dedup on an ending artifact), strip C0 controls (except
    tab/newline, which the whitespace rules own) and DEL, collapse
    horizontal-whitespace runs to one space, trim outer
    [ \\t\\r\\n].  None → None.  Idempotent (hypothesis-pinned)."""
    import unicodedata

    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL_RE.sub("", s)
    s = _HWS_RE.sub(" ", s)
    return s.strip(_STRIP_CHARS)


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, norm_text, changed) per document — the hygiene pass
    between charset decode and everything digest-based: NFC
    composition (the same grapheme in composed vs decomposed form
    would otherwise md5 to different digests, splitting exact dedup,
    paragraph dedup and the template index on a byte-encoding
    artifact), control-char strip (tracking pixels, PDF extractor
    residue), horizontal-whitespace collapse, outer trim.

    Unicode normalization has no JVM expression, so this is one
    Arrow-batched map-only pass (same shape as decode_pages — rides
    the scan, zero Exchange); everything downstream stays JVM-side.
    ``changed`` marks documents the pass actually touched, so an
    incremental deployment can re-digest only those."""

    def fn(batches):
        for pdf in batches:
            norm = pdf[text_col].map(normalize_unicode)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "norm_text": norm,
                    "changed": norm.ne(pdf[text_col])
                    & ~(norm.isna() & pdf[text_col].isna()),
                }
            )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        fn, schema=f"id {df.schema[id_col].dataType.simpleString()}, "
        "norm_text string, changed boolean"
    )
