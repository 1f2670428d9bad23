"""Single-process golden oracle (SURVEY.md §5 strategy item 2).

Re-runs the extraction semantics one document at a time in plain
Python — the same per-request lifecycle the reference service executes
(validate → route → extract/OCR pages → clean → assemble;
reference api/routers/ocr.py:124-178 and 239-301) — with zero Spark.
pytest asserts the distributed pipeline's output is byte-identical
per url to this oracle, which is what makes the Spark job's
partitioning/shuffle/reassembly verifiable rather than trusted.
"""

from __future__ import annotations

from extractor.cleaning import clean_stdout_output
from extractor.config import (
    ERR_EMPTY,
    ERR_TOO_LARGE,
    ERR_TOO_MANY_PAGES,
    ERR_UNSUPPORTED,
    HTML_EXTS,
    IMAGE_EXTS,
    PDF_EXTS,
    ExtractConfig,
)
from extractor.engine import SurrogateEngine
from extractor.html_extract import html_to_markdown
from extractor.pdf_extract import split_pdf_pages


def url_extension(url: str) -> str:
    path = url.split("?", 1)[0].split("#", 1)[0]
    last = path.rsplit("/", 1)[-1]
    if "." not in last:
        return ""
    return last.rsplit(".", 1)[-1].lower()


def doc_type_for(url: str) -> str:
    ext = url_extension(url)
    if ext in HTML_EXTS:
        return "html"
    if ext in PDF_EXTS:
        return "pdf"
    if ext in IMAGE_EXTS:
        return "image"
    return "unsupported"


def extract_one(url: str, payload: bytes | None, cfg: ExtractConfig = ExtractConfig()) -> dict:
    """Extract a single document — the per-request reference lifecycle."""
    from extractor.engine import resolve_prompt

    # T9+F6 exactly like the pipeline: resolve+validate up front (an
    # invalid format must fail the oracle the same way it fails the
    # job), and pass the resolved prompt to every inference call so
    # golden parity holds for every output format, not just markdown.
    prompt = resolve_prompt(cfg.output_format)
    doc_type = doc_type_for(url)
    base = {
        "url": url,
        "doc_type": doc_type,
        "text": None,
        "pages": None,
        "total_pages": None,
        "success": False,
        "error": None,
        "warnings": None,
    }
    if doc_type == "unsupported":
        base["error"] = ERR_UNSUPPORTED
        return base
    if payload is None or len(payload) == 0:
        base["error"] = ERR_EMPTY
        return base
    if len(payload) > cfg.max_bytes:
        base["error"] = ERR_TOO_LARGE
        return base

    engine = SurrogateEngine()
    if doc_type == "html":
        markdown = html_to_markdown(payload)
        base["text"] = clean_stdout_output(markdown, strip_grounding=cfg.strip_grounding)
        base["success"] = True
        return base

    if doc_type == "image":
        # reference image lifecycle (ocr.py:77-178): compress/resize →
        # single-image inference → clean; OCR failure → error response
        from extractor.operators.multimodal import compress_image

        try:
            compressed, _w, _h, _ow, _oh = compress_image(payload)
            raw = engine.infer_batch([compressed], prompt)[0]
            base["text"] = clean_stdout_output(raw, strip_grounding=cfg.strip_grounding)
            base["success"] = True
        except Exception as exc:
            base["error"] = str(exc)
        return base

    # pdf branch — reference pdf_processor.py:112-277 semantics
    try:
        pages = split_pdf_pages(payload)
    except ValueError as exc:
        base["error"] = str(exc)
        return base
    if len(pages) > cfg.max_pdf_pages:
        base["error"] = ERR_TOO_MANY_PAGES
        return base
    page_results = []
    warnings: list[str] = []
    for i, page in enumerate(pages):
        try:
            raw = engine.infer_batch([page], prompt)[0]
            text = clean_stdout_output(raw, strip_grounding=cfg.strip_grounding)
            text = text.strip() if text else ""  # T10, pdf_processor.py:222
            page_results.append(
                {"page_number": i + 1, "text": text, "success": True, "error": None}
            )
        except Exception as exc:  # per-page isolation, pdf_processor.py:228-247
            # page dict carries str(e) raw; the doc-level warning adds
            # the prefix (pdf_processor.py:230, 241-247)
            page_results.append(
                {
                    "page_number": i + 1,
                    "text": "",
                    "success": False,
                    "error": str(exc),
                }
            )
            warnings.append(f"Failed to process page {i + 1}: {exc}")
    base["pages"] = page_results
    base["warnings"] = warnings
    base["total_pages"] = len(page_results)
    base["success"] = all(p["success"] for p in page_results)  # ocr.py:293
    base["text"] = "\n\n".join(p["text"] for p in page_results if p["success"])
    return base


def golden_for_documents(doc_rows, cfg: ExtractConfig = ExtractConfig()) -> dict[str, dict]:
    """Golden outputs keyed by url for (doc_id, text, lang) tuples."""
    from extractor.testgen import make_page_record

    golden = {}
    for doc_id, text, lang in doc_rows:
        rec = make_page_record(int(doc_id), text, lang)
        golden[rec["url"]] = extract_one(rec["url"], rec["html"], cfg)
    return golden
