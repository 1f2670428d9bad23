#!/usr/bin/env python
"""One-off experiment: decompose the scaling gap.

Usage: python scripts/exp_scaling.py <cpus> <replicate> <part_mult>
Prints JSON: median-of-3 pipeline wall sec + docs/sec.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

cpus = int(sys.argv[1])
replicate = int(sys.argv[2])
part_mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
os.environ.setdefault("BENCH_TEXT_MULT", "100")

from extractor.config import ExtractConfig
from extractor.pipeline import run_extraction
from extractor.session import build_session
from extractor.testgen import TEST_MAX_BYTES
import bench

spark = build_session(
    app_name=f"exp-{cpus}-{part_mult}",
    master=f"local[{cpus}]",
    shuffle_partitions=cpus * part_mult,
)
spark.sparkContext.setLogLevel("ERROR")
pages = bench.replicated_pages(spark, "/root/testdata/sf0.1", replicate).cache()
n = pages.count()
cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
bench.force(run_extraction(spark, pages, cfg))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    bench.force(run_extraction(spark, pages, cfg))
    times.append(time.perf_counter() - t0)
dt = sorted(times)[1]
print(json.dumps({"cpus": cpus, "replicate": replicate, "part_mult": part_mult,
                  "docs": n, "sec": round(dt, 3),
                  "all": [round(t, 3) for t in times],
                  "docs_per_sec": round(n / dt, 2)}))
spark.stop()
