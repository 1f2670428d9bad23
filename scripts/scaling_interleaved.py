#!/usr/bin/env python
"""Interleaved two-parallelism scaling measurement.

The sandbox host shows 2-3× wall-time variance between identical runs
(shared-host noise; even a pure-CPU control moves between 0.76 and
0.89 apparent ceiling across minutes).  Sequential measurement blocks
therefore conflate host weather with pipeline scaling.  This harness
alternates N-core and 4N-core trials (A/B/A/B…) and takes the best
trial per configuration — external noise is strictly additive, so the
minimum is the least-contaminated estimate of each configuration's
capability.

Writes BENCH/scaling.json and prints the summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling import REPO, cpu_control, run_one  # noqa: E402


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    os.environ.setdefault("BENCH_TEXT_MULT", "100")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")

    control = cpu_control()
    print(json.dumps(control))
    best: dict[int, dict] = {}
    trials: dict[int, list] = {4: [], 8: [], 16: [], 32: []}
    for _ in range(rounds):
        for cpus in (4, 16, 8, 32):
            r = run_one(cpus, replicate, sf_dir)
            # run_one already reports the median of 3 in-process passes;
            # keep the per-pass min as this trial's best
            r["best_sec"] = min(r["all_runs_sec"])
            r["best_docs_per_sec"] = round(r["docs"] / r["best_sec"], 2)
            trials[cpus].append(r)
            if cpus not in best or r["best_docs_per_sec"] > best[cpus]["best_docs_per_sec"]:
                best[cpus] = r
            print(json.dumps(r))
    result = {
        "control": control,
        "best": {k: best[k] for k in sorted(best)},
        "trials": trials,
        "efficiency_4_to_16": round(
            best[16]["best_docs_per_sec"] / best[4]["best_docs_per_sec"] / 4, 3
        ),
        "efficiency_8_to_32": round(
            best[32]["best_docs_per_sec"] / best[8]["best_docs_per_sec"] / 4, 3
        ),
    }
    # Machine-normalized: this box's own pure-CPU scaling ceiling is
    # <1.0 (frequency scaling + SMT past the physical-core count), so
    # also report efficiency relative to what ANY perfectly-parallel
    # job could achieve here.
    result["normalized_4_to_16"] = round(
        result["efficiency_4_to_16"] / control["ceiling_4_to_16"], 3
    )
    result["normalized_8_to_32"] = round(
        result["efficiency_8_to_32"] / control["ceiling_8_to_32"], 3
    )
    print(json.dumps({k: result[k] for k in ("control", "efficiency_4_to_16", "efficiency_8_to_32")}))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(result, fh, indent=2)


if __name__ == "__main__":
    main()
