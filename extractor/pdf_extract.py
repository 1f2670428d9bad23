"""PDF page fan-out (operator T4) over the synthetic page format.

A real deployment opens PDFs with PyMuPDF and rasterizes pages at
dpi=220 (reference services/pdf_processor.py:172-213, constants.py:18);
fitz is not installed in this sandbox, so the pipeline runs on a
deterministic container format with the same structure — a magic
header plus form-feed-separated pages:

    b"%FPDF-1.0\\n" + b"\\x0c".join(b"PAGE <n>\\n" + page_bytes)

``split_pdf_pages`` is the sandbox stand-in for
``fitz.open(...)`` + ``page.get_pixmap(dpi=220)``; swapping in the
real rasterizer changes only this function (same signature), never
the Spark plan around it.
"""

from __future__ import annotations

PDF_MAGIC = b"%FPDF-1.0\n"
PAGE_SEP = b"\x0c"

# Reference defaults (constants.py:34-35).
MAX_FILE_SIZE_BYTES = 50 * 1024 * 1024
MAX_PDF_PAGES = 100


def is_pdf(payload: bytes) -> bool:
    return payload is not None and bytes(payload[:10]) == PDF_MAGIC


def build_pdf(pages: list[bytes]) -> bytes:
    """Assemble the synthetic container (testgen + fixtures use this)."""
    numbered = [b"PAGE %d\n" % (i + 1) + p for i, p in enumerate(pages)]
    return PDF_MAGIC + PAGE_SEP.join(numbered)


def split_pdf_pages(payload: bytes) -> list[bytes]:
    """Open a document and return its page payloads, in order.

    Raises ``ValueError`` on a non-PDF payload — the analog of
    ``fitz.open`` failing on corrupt bytes; the pipeline catches it
    per row and emits an error row (pdf_processor.py semantics).
    """
    payload = bytes(payload)
    if not is_pdf(payload):
        raise ValueError("not a PDF document")
    body = payload[len(PDF_MAGIC):]
    if not body:
        return []
    return body.split(PAGE_SEP)
