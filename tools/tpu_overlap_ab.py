#!/usr/bin/env python
"""On-chip A/B of the Stockham kernel's DMA/compute overlap levers
(VERDICT r4 item 1a): grid ``dimension_semantics`` (parallel vs
arbitrary) x DMA tile rows (128 vs 256), at the declared roofline
operating point (pallas_sk, n=4096, batch=32768).

Round-4 finding this attacks: the kernel's GB/s sat INVARIANT at
165-171 across slots while the DMA+transpose budget probe ran at ~98 %
of the slot's achievable — ~3 ms of VPU butterfly work per call was not
hiding under the auto-pipelined tile DMA.  If relaxing the sequential
grid assumption (the iterations are pure batch tiling, genuinely
independent) lets Mosaic overlap the stage loop with the next tile's
fetch, the kernel rate should start TRACKING the slot's achievable
instead of sitting below it.

Protocol (the paired-measurement discipline of VERDICT r4 item 1b):
every kernel rep is bracketed by its OWN achievable-bandwidth probe,
and the recorded ratio is kernel_gbps / paired_probe_gbps — a co-tenant
burst hits both sides of the SAME rep.  Arms are interleaved
round-robin so slot drift cancels from the arm comparison.  A
slot-health gate (probe < 50 GB/s) marks the rep contaminated; the
summary reports medians over clean reps only, with the rejects counted.

Run: python tools/tpu_overlap_ab.py [--reps 4] [--json-out PATH]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json
import statistics
import time

import numpy as np

ARMS = [
    {"name": "arb_r128", "dimsem": "arbitrary", "rows": "128"},
    {"name": "par_r128", "dimsem": "parallel", "rows": "128"},
    {"name": "par_r256", "dimsem": "parallel", "rows": "256"},
    {"name": "arb_r256", "dimsem": "arbitrary", "rows": "256"},
]
OP = {"n": 4096, "batch": 32768}
HEALTH_MIN_GBPS = 50.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=4)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--manual", action="store_true",
                   help="A/B the explicit multi-buffered DMA pipeline "
                        "(ASP_SK_PIPE=manual) vs the auto grid pipeline")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    global ARMS
    if args.manual:
        # the manual form clamps its tile to 128 rows (VMEM: 4 rings x
        # NBUF deep + stage temporaries; 256 measured OOM at AOT)
        ARMS = [
            {"name": "auto_r128", "dimsem": "parallel", "rows": "128",
             "pipe": "auto"},
            {"name": "manual_r128", "dimsem": "parallel", "rows": "128",
             "pipe": "manual"},
        ]

    import jax

    from benchmarks.roofline import (
        bench_fft, measure_achievable_gbps, measure_iteration_floor_ms,
    )

    print(json.dumps({"backend": jax.default_backend(), "op": OP,
                      "arms": [a["name"] for a in ARMS]}), flush=True)
    floor_ms = measure_iteration_floor_ms()
    print(json.dumps({"iteration_floor_ms": round(floor_ms, 3)}), flush=True)

    # bench_fft re-jits per call (env read at trace time), so flipping
    # the env between calls is a true arm switch
    rows = []
    for rep in range(args.reps):
        for arm in ARMS:
            os.environ["ASP_SK_DIMSEM"] = arm["dimsem"]
            os.environ["ASP_SK_ROWS"] = arm["rows"]
            os.environ["ASP_SK_PIPE"] = arm.get("pipe", "auto")
            probe_pre, _ = measure_achievable_gbps(floor_ms=floor_ms)
            t0 = time.perf_counter()
            dt, _gflops, gbps = bench_fft("pallas_sk", OP["batch"], OP["n"],
                                          iters=args.iters)
            wall = time.perf_counter() - t0
            probe_post, _ = measure_achievable_gbps(floor_ms=floor_ms)
            paired = 0.5 * (probe_pre + probe_post)
            clean = min(probe_pre, probe_post) >= HEALTH_MIN_GBPS
            r = {"arm": arm["name"], "rep": rep, "ms": round(dt * 1e3, 3),
                 "kernel_gbps": round(gbps, 1),
                 "probe_pre_gbps": round(probe_pre, 1),
                 "probe_post_gbps": round(probe_post, 1),
                 "paired_frac": round(gbps / paired, 3),
                 "clean": clean, "wall_s": round(wall, 1)}
            rows.append(r)
            print(json.dumps(r), flush=True)

    summary = {}
    for arm in ARMS:
        sel = [r for r in rows if r["arm"] == arm["name"] and r["clean"]]
        rej = sum(1 for r in rows if r["arm"] == arm["name"] and not r["clean"])
        if sel:
            summary[arm["name"]] = {
                "n_clean": len(sel), "n_rejected": rej,
                "kernel_gbps_median": round(statistics.median(
                    r["kernel_gbps"] for r in sel), 1),
                "kernel_gbps_min": min(r["kernel_gbps"] for r in sel),
                "kernel_gbps_max": max(r["kernel_gbps"] for r in sel),
                "paired_frac_median": round(statistics.median(
                    r["paired_frac"] for r in sel), 3),
            }
        else:
            summary[arm["name"]] = {"n_clean": 0, "n_rejected": rej}
    out = {"op": OP, "iters": args.iters,
           "iteration_floor_ms": round(floor_ms, 3),
           "health_min_gbps": HEALTH_MIN_GBPS, "reps": rows,
           "summary": summary}
    print(json.dumps({"summary": summary}), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
