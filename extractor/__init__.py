"""extractor — a from-scratch PySpark-native document-to-markdown
extraction engine with the capabilities of
``MaximilianoVeiga/deepseek-ocr-api`` (reference, read-only at
/root/reference), re-expressed Spark-first.

The reference is a per-request FastAPI OCR service (one document per
HTTP request, a single GPU worker thread).  This package replaces that
execution model with batch DataFrame pipelines over an Iceberg-style
pages table ``(url, warc_ts, html binary, text, lang)``:

* ``extractor.cleaning``      — byte-exact text cleaning spec (T7/T8)
* ``extractor.html_extract``  — boilerplate-stripping HTML→markdown
* ``extractor.pdf_extract``   — page fan-out + surrogate OCR engine
* ``extractor.pipeline``      — the end-to-end Spark job
* ``extractor.writer``        — atomic-commit sink + resume
* ``extractor.oracle``        — single-process golden oracle
* ``extractor.operators``     — dedup / similarity / text-stats /
  multimodal operators for training-data pipelines
* ``extractor.streaming``     — Structured Streaming variants

Operator numbers (S1..S5, F1..F8, T1..T10, A1..A6, O1..O5) refer to
SURVEY.md §2.
"""

__version__ = "0.1.0"

MODEL_VERSION = "surrogate-0.1.0"
