"""Page-metadata extraction: the index/display fields (title, meta
description, canonical link, declared language, og:title) a pipeline
ships next to the extracted markdown body.

The reference returns only the OCR/markdown text per upload
(routes/ocr.py); a corpus-grade extractor must also carry the head
fields — canonical URLs feed the dedup/url-canonicalization tier,
declared ``lang`` cross-checks the n-gram language ID, titles feed
relevance.

Scale shape: one Arrow-batched ``mapInPandas`` pass over the pages
scan — map-only, no shuffle, no driver state; the parser is the same
stdlib ``HTMLParser`` grammar the main-content extractor uses, so a
page parses once per stage with zero extra dependencies.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "url string, title string, description string, canonical string,"
    " lang string, og_title string"
)


def page_metadata(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, title, description, canonical, lang, og_title) per page;
    NULL where the head omits the field.  First occurrence wins per
    field (browser behavior; duplicated meta is spam)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from extractor.html_extract import extract_metadata

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                m = extract_metadata(getattr(r, html_col))
                rows.append(
                    (getattr(r, url_col), m["title"], m["description"],
                     m["canonical"], m["lang"], m["og_title"])
                )
            yield pd.DataFrame(
                rows,
                columns=["url", "title", "description", "canonical",
                         "lang", "og_title"],
            )

    return pages.select(F.col(url_col), F.col(html_col)).mapInPandas(
        fn, schema=META_SCHEMA
    )
