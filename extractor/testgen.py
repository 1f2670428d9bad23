"""Deterministic pages-table synthesis (FIXTURES.md §1).

Derives a Common-Crawl-style pages table
``(url, warc_ts, html binary, text, lang)`` from the driver-provided
``documents.parquet`` (seeded, read-only): every page row is a pure
function of ``(doc_id, text, lang)``, so the same table materializes
identically in a pandas loop (the oracle) and in a distributed Spark
job at any scale prefix.  No wall-clock, no randomness.

Row-class mix (doc_id mod 20; FIXTURES.md ratios):
  0-5   html_simple    — clean article HTML
  6     image_png      — standalone image (reference's PRIMARY
                         endpoint POST /ocr/image); payload
                         ``IMG <w>x<h>\\n<text>`` so the resize
                         arithmetic (T2) runs on real numbers
  7     image_jpg      — ditto; every other one (doc_id % 40 == 7)
                         carries the corrupt marker to exercise
                         image-level error isolation
  8-11  html_boiler    — same content inside nav/aside/footer link farms
  12-14 pdf_small      — 1-3 page synthetic PDF
  15    pdf_large      — 24-30 page PDF (the skew row); every other
                         pdf_large (doc_id % 40 == 15) carries one
                         corrupt page to exercise per-page error
                         isolation (reference pdf_processor.py:228-247)
  16-17 html_grounded  — html whose text embeds grounding tags + model
                         noise lines (cleaner exercise, T7/T8)
  18    reject_empty   — empty payload (reference ocr.py:71-72)
  19    reject_ext     — url ending .exe (constants.py:65-77)
plus doc_id % 97 == 0 → reject_oversize (payload larger than the
scaled-down test cap; reference image_processor.py:142-146).
"""

from __future__ import annotations

import datetime as _dt

from extractor.engine import CORRUPT_MARKER
from extractor.pdf_extract import build_pdf

EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

# Scaled-down oversize threshold used by tests/bench (the reference cap
# is 50 MB; synthesizing >50 MB rows in tests would be waste).
TEST_MAX_BYTES = 65536

CLASSES = [
    "html_simple", "html_simple", "html_simple", "html_simple",
    "html_simple", "html_simple",
    "image_png", "image_jpg",
    "html_boiler", "html_boiler", "html_boiler", "html_boiler",
    "pdf_small", "pdf_small", "pdf_small",
    "pdf_large",
    "html_grounded", "html_grounded",
    "reject_empty",
    "reject_ext",
]


def row_class(doc_id: int) -> str:
    if doc_id % 97 == 0:
        return "reject_oversize"
    return CLASSES[doc_id % 20]


def _sentences(words: list[str], n: int) -> list[str]:
    """Split a word list into n roughly-equal space-joined chunks."""
    if not words:
        return [""] * n
    size = max(1, len(words) // n)
    chunks = [" ".join(words[i * size : (i + 1) * size]) for i in range(n - 1)]
    chunks.append(" ".join(words[(n - 1) * size :]))
    return chunks


def _html_simple(doc_id: int, words: list[str]) -> bytes:
    s = _sentences(words, 4)
    lis = words[:3] if len(words) >= 3 else (words + ["item"] * 3)[:3]
    rows = "".join(
        f"<tr><td>{w}</td><td>{len(w)}</td></tr>" for w in words[3:6]
    )
    html = (
        f"<html><head><title>Doc {doc_id}</title>"
        f"<style>body{{margin:0}}</style>"
        f"<script>var t={doc_id};</script></head><body>"
        f"<h1>Doc {doc_id}: {' '.join(words[:3])}</h1>"
        f"<p>{s[0]}</p>"
        f"<h2>Section A</h2>"
        f"<p>{s[1]}</p>"
        f"<ul><li>{lis[0]}</li><li>{lis[1]}</li><li>{lis[2]}</li></ul>"
        f"<h2>Section B</h2>"
        f"<table><tr><th>term</th><th>len</th></tr>{rows}</table>"
        f"<p>{s[2]}</p><p>{s[3]}</p>"
        f"</body></html>"
    )
    return html.encode("utf-8")


def _link_farm(doc_id: int, n: int) -> str:
    return "".join(
        f'<a href="/x/{doc_id}/{i}">{"link word %d" % i}</a> ' for i in range(n)
    )


def _html_boiler(doc_id: int, words: list[str]) -> bytes:
    core = _html_simple(doc_id, words).decode("utf-8")
    body_inner = core[core.index("<body>") + 6 : core.index("</body>")]
    head = core[: core.index("<body>") + 6]
    html = (
        head
        + f"<nav><ul><li>{_link_farm(doc_id, 4)}</li><li>{_link_farm(doc_id + 1, 4)}</li></ul></nav>"
        + f'<div><p>{_link_farm(doc_id, 6)}</p></div>'
        + f"<article>{body_inner}</article>"
        + f"<aside><p>{_link_farm(doc_id + 2, 5)}</p></aside>"
        + f"<footer><p>© example {doc_id} — {_link_farm(doc_id, 3)}</p></footer>"
        + "</body></html>"
    )
    return html.encode("utf-8")


def _html_grounded(doc_id: int, words: list[str]) -> bytes:
    s = _sentences(words, 3)
    html = (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        f"<h1>Doc {doc_id} grounded</h1>"
        f"<p>&lt;|ref|&gt;title&lt;|/ref|&gt;&lt;|det|&gt;[[1, 2, 3, 4]]&lt;|/det|&gt;{s[0]}</p>"
        f"<p>=====debug banner=====</p>"
        f"<p>BASE: torch.Size([1, 3, 1024, 1024])</p>"
        f"<p>{s[1]} &lt;|ref|&gt;figure&lt;|/ref|&gt; trailing</p>"
        f"<p>(0x0)</p>"
        f"<p>{s[2]}</p>"
        f"</body></html>"
    )
    return html.encode("utf-8")


def _pdf_pages_text(doc_id: int, words: list[str], n_pages: int) -> list[str]:
    return _sentences(words, n_pages)


def image_dims(doc_id: int) -> tuple[int, int]:
    """Synthetic image dimensions: deterministic, spanning both sides
    of the 2048 resize threshold (some rows resize, some don't)."""
    return 640 + (doc_id * 37) % 3000, 480 + (doc_id * 53) % 3000


def _image_payload(doc_id: int, text: str) -> bytes:
    w, h = image_dims(doc_id)
    payload = f"IMG {w}x{h}\n{text}".encode("utf-8")
    if doc_id % 40 == 7:  # every other image_jpg: undecodable image
        payload = CORRUPT_MARKER + payload
    return payload


def make_page_record(doc_id: int, text: str, lang: str) -> dict:
    """One deterministic pages-table row from one documents-table row."""
    cls = row_class(doc_id)
    words = (text or "").split()
    ext = {
        "reject_ext": ".exe", "image_png": ".png", "image_jpg": ".jpg",
    }.get(cls, ".pdf" if cls.startswith("pdf") else ".html")
    url = f"https://example-42.test/{cls}/{doc_id:06d}{ext}"
    ts = EPOCH + _dt.timedelta(seconds=doc_id)

    if cls == "reject_oversize":
        payload: bytes | None = b"x" * (TEST_MAX_BYTES + 1)
    elif cls == "reject_empty":
        payload = b""
    elif cls == "reject_ext":
        payload = b"MZ\x90\x00 not a document"
    elif cls == "html_simple":
        payload = _html_simple(doc_id, words)
    elif cls == "html_boiler":
        payload = _html_boiler(doc_id, words)
    elif cls == "html_grounded":
        payload = _html_grounded(doc_id, words)
    elif cls in ("image_png", "image_jpg"):
        payload = _image_payload(doc_id, text or "")
    else:  # pdf_small | pdf_large
        n_pages = 1 + doc_id % 3 if cls == "pdf_small" else 24 + doc_id % 7
        pages = [t.encode("utf-8") for t in _pdf_pages_text(doc_id, words, n_pages)]
        if cls == "pdf_large" and doc_id % 40 == 15:
            pages[1] = CORRUPT_MARKER + pages[1]
        payload = build_pdf(pages)

    return {
        "url": url,
        "warc_ts": ts,
        "html": payload,
        "text": text,
        "lang": lang,
    }


def pages_from_docs(docs):
    """(doc_id, text, lang) DataFrame → synthetic pages table.

    Scan-side generation: one ``mapInPandas``, so at scale the pages
    table inherits the scan's partitioning and never bottlenecks on
    the driver.  Shared by :func:`pages_df` and the bench harness —
    one definition of the docs→pages contract."""
    import pandas as pd

    from extractor.schema import PAGES_SCHEMA

    def gen(batches):
        for pdf in batches:
            recs = [
                make_page_record(int(r.doc_id), r.text, r.lang)
                for r in pdf.itertuples(index=False)
            ]
            yield pd.DataFrame(recs, columns=[f.name for f in PAGES_SCHEMA.fields])

    return docs.mapInPandas(gen, schema=PAGES_SCHEMA)


def pages_df(spark, sf_dir: str):
    """The synthetic pages table for a testdata scale dir."""
    return pages_from_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text", "lang"
        )
    )
