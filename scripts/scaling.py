#!/usr/bin/env python
"""Two-parallelism scaling run (north_rule evidence).

The rule requires throughput scaling efficiency ≥ 0.8 between N and
4N executors; the sandbox has one machine, so the same job runs on the
same input at local[8] and local[32] (per the driver's stated
protocol) and we report docs/sec at both plus
``efficiency = (throughput_32 / throughput_8) / 4``.

Each configuration runs in its own subprocess → fresh JVM, no warm
caches shared between configurations.  Usage:

    python scripts/scaling.py [replicate] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from extractor.config import ExtractConfig
from extractor.pipeline import run_extraction
from extractor.session import build_session
from extractor.testgen import TEST_MAX_BYTES
sys.path.insert(0, %(repo)r)
import importlib
bench = importlib.import_module("bench")

cpus = %(cpus)d
# 3x partitions per core: with exactly N partitions on N cores one
# straggler idles the rest of the machine; 3x gives the scheduler
# room to rebalance (same reason a real cluster runs 2-3x partitions
# per executor-core).
spark = build_session(app_name="scaling-%(cpus)d", master="local[%(cpus)d]",
                      shuffle_partitions=%(cpus)d * 3)
spark.sparkContext.setLogLevel("ERROR")
pages = bench.replicated_pages(spark, %(sf_dir)r, %(replicate)d).cache()
n = pages.count()
cfg = ExtractConfig(max_bytes=TEST_MAX_BYTES)
# full warm-up pass: python-worker pool, JIT, shuffle services all hot
# (limit() would collapse to one partition and warm a single worker);
# then median of 3 timed passes — the sandbox box shows 2-3x wall
# variance between identical runs, so single-shot numbers are noise.
bench.force(run_extraction(spark, pages, cfg))
times = []
for _ in range(3):
    t0 = time.perf_counter()
    bench.force(run_extraction(spark, pages, cfg))
    times.append(time.perf_counter() - t0)
dt = sorted(times)[1]
print(json.dumps({"cpus": cpus, "docs": n, "sec": round(dt, 3),
                  "all_runs_sec": [round(t, 3) for t in times],
                  "docs_per_sec": round(n / dt, 2)}))
spark.stop()
"""


def run_one(cpus: int, replicate: int, sf_dir: str) -> dict:
    code = CHILD % {"repo": REPO, "cpus": cpus, "sf_dir": sf_dir, "replicate": replicate}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _burn(_):
    import time

    t0 = time.time()
    x = 0
    while time.time() - t0 < 3:
        x += 1
    return x


def cpu_control() -> dict:
    """Pure-CPU multiprocessing control: this box's own scaling ceiling
    (frequency scaling under load caps everything below ideal)."""
    import multiprocessing as mp
    import time

    burn = _burn
    rates = {}
    for n in (4, 8, 16, 32):
        with mp.Pool(n) as p:
            t0 = time.time()
            r = p.map(burn, range(n))
            rates[n] = sum(r) / (time.time() - t0)
    return {
        "ceiling_4_to_16": round(rates[16] / rates[4] / 4, 3),
        "ceiling_8_to_32": round(rates[32] / rates[8] / 4, 3),
    }


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.environ.setdefault("BENCH_TEXT_MULT", "100")
    # 120k docs x ~30 KB cached input: the job must be long enough at
    # 4N cores (>=25 s) that per-stage barrier/scheduling constants
    # (~2-3 s, dominated by the 3-stage pdf branch) don't masquerade
    # as anti-scaling; at 100 TB those constants are invisible.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    control = cpu_control()
    print(json.dumps(control))
    pairs = {}
    for n in (4, 8, 16, 32):
        pairs[n] = run_one(n, replicate, sf_dir)
        print(json.dumps(pairs[n]))
    result = {
        "control": control,
        "runs": pairs,
        "efficiency_4_to_16": round(
            pairs[16]["docs_per_sec"] / pairs[4]["docs_per_sec"] / 4, 3
        ),
        "efficiency_8_to_32": round(
            pairs[32]["docs_per_sec"] / pairs[8]["docs_per_sec"] / 4, 3
        ),
    }
    print(json.dumps(result))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
