#!/usr/bin/env python
"""Interleaved A/B pipeline_extract benchmark across git revisions.

Decides noise-vs-regression for the flagship's wall time (VERDICT r2
item 7): each trial spawns a FRESH python subprocess that imports
`extractor` + `bench.replicated_pages` from one revision's worktree
and times `run_extraction` exactly as bench.py does (warm-up pass,
then best of 2 timed noop-sink materializations).  Revisions are
interleaved round-robin so host weather hits all variants equally;
the per-variant BEST is the comparator (host noise is additive — see
BASELINE.md "Measured scaling" protocol).

Usage:
  python scripts/ab_pipeline.py NAME=/path/to/worktree ... [trials]

Prints one JSON line: {"trials": N, "best": {name: sec}, "all": ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

TRIAL_CODE = r"""
import sys, time, os
wt = sys.argv[1]
sys.path.insert(0, wt)
from extractor.session import build_session
from extractor.config import ExtractConfig
from extractor.pipeline import run_extraction
from extractor.testgen import TEST_MAX_BYTES
import importlib.util
spec = importlib.util.spec_from_file_location("benchmod", os.path.join(wt, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = build_session(app_name="ab-pipeline", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = bench.replicated_pages(spark, sf_dir, int(os.environ.get("BENCH_REPLICATE", "4"))).cache()
pages.count()
cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(run_extraction(spark, pages, cfg))  # warm-up
runs = []
for _ in range(2):
    t0 = time.perf_counter()
    force(run_extraction(spark, pages, cfg))
    runs.append(time.perf_counter() - t0)
print("RESULT %.4f" % min(runs))
spark.stop()
"""


def run_trial(wt: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", TRIAL_CODE, wt],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "BENCH_TEXT_MULT": os.environ.get("BENCH_TEXT_MULT", "20")},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1])
    raise RuntimeError(f"trial failed for {wt}:\n{out.stderr[-2000:]}")


def main() -> None:
    variants: dict[str, str] = {}
    trials = 3
    for arg in sys.argv[1:]:
        if "=" in arg:
            name, path = arg.split("=", 1)
            variants[name] = path
        else:
            trials = int(arg)
    if not variants:
        variants = {"head": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    results: dict[str, list[float]] = {n: [] for n in variants}
    for t in range(trials):
        for name, wt in variants.items():
            sec = run_trial(wt)
            results[name].append(sec)
            print(f"# trial {t + 1}/{trials} {name}: {sec:.3f}s", file=sys.stderr)
    print(json.dumps({
        "trials": trials,
        "best": {n: round(min(v), 3) for n, v in results.items()},
        "all": {n: [round(x, 3) for x in v] for n, v in results.items()},
    }))


if __name__ == "__main__":
    main()
