#!/usr/bin/env python
"""Giant-PDF skew: measured evidence that page-level salting works.

north_rule: "skew from giant PDFs is handled by page-level salting".
AQE can split oversized SHUFFLE partitions, but a 100-page PDF is one
ROW — no optimizer can split it after the fact.  The fix is
structural: explode to pages BEFORE the expensive stage, then
repartition on (url, page_number) so one document's pages scatter
across the cluster.

This script constructs the adversarial input — all giant PDFs
clustered in ONE input partition (a crawl segment of scanned
documents, the realistic layout) — and times two physically different
plans over identical data on local[8]:

  naive:  fused explode+OCR inside the input partitioning (the shape a
          per-document pipeline naturally has; reference lifecycle).
          The giant partition serializes on one core.
  salted: the engine's real pdf branch (explode → repartition(url,
          page_number) → OCR → reassembly).

Writes BENCH/skew.json: wall seconds for both, speedup, and the
per-task page-count spread that explains it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from extractor.config import ExtractConfig  # noqa: E402
from extractor.engine import get_engine  # noqa: E402
from extractor.cleaning import clean_stdout_output  # noqa: E402
from extractor.pdf_extract import build_pdf, split_pdf_pages  # noqa: E402
from extractor.pipeline import extract_pdf  # noqa: E402
from extractor.session import build_session  # noqa: E402

CPUS = 8
N_SMALL = 80           # 3 pages each, spread over CPUS partitions
N_GIANT = 12           # 100 pages each, ALL in one partition
PAGE_WORDS = 2000      # ~10 KB/page
# Simulated inference latency per page.  The byte-linear surrogate is
# ~1000x cheaper per byte than real DeepSeek-OCR (~2 s/page,
# README.md:356-363), which makes payload shuffle cost comparable to
# the straggler and hides the skew effect; 10 ms/page restores the
# latency-bound regime the salting is designed for (still 200x
# cheaper than the real model).
PAGE_MS = "10"


def _page_text(doc_id: int, page: int) -> str:
    base = f"doc-{doc_id} page-{page} "
    words = [f"w{(doc_id * 31 + page * 7 + k) % 9973}" for k in range(PAGE_WORDS)]
    return base + " ".join(words)


def _gen_iter(n_pages: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                d = int(r.id)
                pages = [_page_text(d, p).encode() for p in range(n_pages)]
                rows.append(
                    (f"https://example-42.test/skew/{d:06d}.pdf", build_pdf(pages))
                )
            yield pd.DataFrame(rows, columns=["url", "html"])

    return fn


def make_docs(spark):
    schema = "url string, html binary"
    small = (
        spark.range(N_SMALL).repartition(CPUS)
        .mapInPandas(_gen_iter(3), schema=schema)
    )
    giant = (
        spark.range(10_000, 10_000 + N_GIANT).coalesce(1)
        .mapInPandas(_gen_iter(100), schema=schema)
    )  # the adversarial layout: every giant doc in one partition
    return small.unionAll(giant).withColumn(
        "warc_ts", F.lit("2026-01-01 00:00:00").cast("timestamp")
    )


def naive_fused_iter(cfg: ExtractConfig):
    """Per-document processing inside the input partitioning — the
    reference's lifecycle shape (one request = one doc, all pages
    sequential on one worker)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        engine = get_engine()
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pages = split_pdf_pages(r.html)
                raws = engine.infer_batch([bytes(p) for p in pages])
                texts = [
                    (clean_stdout_output(raw, strip_grounding=True) or "").strip()
                    for raw in raws
                ]
                rows.append((r.url, "\n\n".join(texts), len(pages)))
            yield pd.DataFrame(rows, columns=["url", "text", "total_pages"])

    return fn


def main() -> None:
    os.environ["SPARK_GRAFT_SURROGATE_PAGE_MS"] = PAGE_MS
    spark = build_session(
        app_name="skew-demo", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 3
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = ExtractConfig()
    docs = make_docs(spark).cache()
    n = docs.count()
    pages_per_part = [
        (r["p"], r["pages"])
        for r in docs.select(F.spark_partition_id().alias("p"), "html")
        .groupBy("p")
        .agg(F.sum(F.size(F.split(F.col("html").cast("string"), "\x0c"))).alias("pages"))
        .collect()
    ]

    def timed(fn):
        fn()  # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        return round(min(runs), 3)

    naive = lambda: docs.mapInPandas(  # noqa: E731
        naive_fused_iter(cfg), schema="url string, text string, total_pages int"
    ).write.format("noop").mode("overwrite").save()
    salted = lambda: extract_pdf(docs, cfg).write.format(  # noqa: E731
        "noop"
    ).mode("overwrite").save()

    t_naive = timed(naive)
    t_salted = timed(salted)
    result = {
        "docs": n,
        "cpus": CPUS,
        "giant_docs": N_GIANT,
        "giant_pages_in_one_partition": N_GIANT * 100,
        "input_partition_page_counts": sorted(p for _, p in pages_per_part),
        "naive_fused_sec": t_naive,
        "salted_sec": t_salted,
        "speedup": round(t_naive / t_salted, 2),
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "skew.json"), "w") as fh:
        json.dump(result, fh, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
