#!/usr/bin/env python
"""Per-round machine-readable perf records (VERDICT r3 items 5/6/8).

Writes, for round N:
  docs/records/roofline_rNN.json — the PAIRED protocol (round 5): >= 12
    repetitions of the declared operating point (pallas_sk, n=4096,
    batch=32768), each bracketed by its OWN achievable-BW probe; the
    gate row pools the per-rep ratios kernel/mean(probe_pre, probe_post)
    with a slot-health floor (probe < 50 GB/s = contaminated, recorded
    but excluded).  No floor subtraction on either side.
  docs/records/bench_rNN.json — headline bench modes x >=3 reps each,
    min/median/max (the chip is time-shared; a single-shot number cannot
    distinguish a real ~5%% regression from slot noise).
  docs/records/configs_rNN.json — configs 1..5 --check SNRs + --bench
    throughput (BASELINE.json:7-11 product-path rows).

Each section is skippable (--skip roofline,bench,configs) and every
record is written as soon as its section completes, so a timeout loses
at most one section.  Compare rounds with tools/check_regression.py.

Run: python tools/record_round.py --round 4
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json
import statistics
import subprocess

import numpy as np

RECORDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "records")

# the declared roofline operating point (docs/PERF.md, BASELINE.json:5)
OP = {"impl": "pallas_sk", "n": 4096, "batch": 32768}
# batch 65536 = the amortized point (per-iteration relay floor ~2.5 % of
# the iteration vs ~5 % at the OP); its round-5 paired median was 0.907
# (roofline_b64k_r05.json) — recorded per rep so future rounds carry it
SECONDARY = [{"impl": "pallas_sk", "n": 1024, "batch": 32768},
             {"impl": "pallas_sk", "n": 4096, "batch": 65536}]
# chain = headline; stream1/res_step = the one-kernel-per-block
# streaming paths; res_env_step = the entire config-5 chain per block
BENCH_MODES = ["chain", "stream1", "res_step", "res_env_step"]


def write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f, indent=1)
        f.write("\n")
    print(f"wrote {path}", flush=True)


def do_roofline(reps: int):
    """PAIRED protocol (round 5, VERDICT r4 item 1b): every kernel rep is
    bracketed by its own achievable-bandwidth probe and the recorded
    ratio is kernel_gbps / mean(probe_pre, probe_post) — a co-tenant
    burst during the rep hits both sides of the SAME ratio instead of a
    denominator measured minutes away.  The gate is the pooled median of
    >= 12 paired ratios.  A slot-health floor (probe < 50 GB/s) marks a
    rep contaminated; contaminated reps are recorded but excluded from
    the pooled median (exclusions visible in the record)."""
    import jax

    from benchmarks.roofline import (
        bench_fft, measure_achievable_gbps, measure_iteration_floor_ms,
    )
    from audiosignalprocess_tpu.utils.metrics import detect_chip

    health_min = 50.0
    chip = detect_chip()
    floor_ms = measure_iteration_floor_ms()
    out = {"backend": jax.default_backend(), "chip": chip.name,
           "spec_gbps": chip.hbm_gbps, "operating_point": OP,
           "protocol": "paired", "health_min_gbps": health_min,
           "iteration_floor_ms": round(floor_ms, 3), "reps": []}
    fracs = []
    for rep in range(reps):
        pre, _ = measure_achievable_gbps(floor_ms=floor_ms)
        rrec = {"probe_pre_gbps": round(pre, 1), "points": []}
        for pt in [OP] + SECONDARY:
            dt, gflops, gbps = bench_fft(pt["impl"], pt["batch"], pt["n"])
            rrec["points"].append({**pt, "ms": round(dt * 1e3, 3),
                                   "hbm_gbps": round(gbps, 1)})
            if pt == OP:
                op_gbps = gbps
        post, _ = measure_achievable_gbps(floor_ms=floor_ms)
        paired = op_gbps / (0.5 * (pre + post))
        clean = min(pre, post) >= health_min
        rrec.update({"probe_post_gbps": round(post, 1),
                     "paired_frac": round(paired, 3), "clean": clean})
        if clean:
            fracs.append(paired)
        out["reps"].append(rrec)
        print(json.dumps(rrec), flush=True)
    med = statistics.median(fracs) if fracs else 0.0
    out["gate"] = {"target": 0.8, "protocol": "paired",
                   "pooled_reps": len(fracs),
                   "rejected_reps": reps - len(fracs),
                   "paired_frac_min": round(min(fracs), 3) if fracs else None,
                   "paired_frac_median": round(med, 3),
                   "paired_frac_max": round(max(fracs), 3) if fracs else None,
                   # legacy key so check_regression diffs r4 -> r5
                   "raw_frac_median": round(med, 3),
                   "pass": bool(med >= 0.8 and len(fracs) >= 3)}
    print(json.dumps(out["gate"]), flush=True)
    return out


def do_bench(reps: int):
    import jax

    import bench

    out = {"backend": jax.default_backend(), "modes": {}}
    for mode in BENCH_MODES:
        vals = []
        for _ in range(reps):
            sps, in_rate = bench.bench_fir_stft_chain(fused=mode)
            vals.append(round(sps, 1))
        out["modes"][mode] = {
            "values": vals, "min": min(vals),
            "median": round(statistics.median(vals), 1), "max": max(vals),
            "unit": "samples/s/chip", "in_rate": in_rate}
        print(json.dumps({mode: out["modes"][mode]}), flush=True)
    return out


def do_configs():
    # two data regimes per config (VERDICT r4 item 6): seed 0 is the
    # historical row (key "config_N", diffed against earlier rounds by
    # check_regression); seed 5 is the second regime ("config_N__seedB")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = {"configs": {}}
    for c, seed, key in [(c, s, f"config_{c}" + ("" if s == 0 else "__seedB"))
                         for c in range(1, 6) for s in (0, 5)]:
        cmd = [sys.executable, os.path.join(repo, "tools", f"run_config_{c}.py"),
               "--check", "--bench", "--json", "--seed", str(seed)]
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=2400, cwd=repo)
            rec = None
            for line in res.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    try:
                        d = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if "snr_db_vs_oracle" in d or "config" in d:
                        rec = d
            if rec is None:
                rec = {"error": f"no report line (rc={res.returncode}): "
                       + res.stderr[-300:]}
        except subprocess.TimeoutExpired:
            rec = {"error": "timeout"}
        out["configs"][key] = rec
        print(json.dumps({key: rec}), flush=True)
    snrs = [v.get("snr_db_vs_oracle") for v in out["configs"].values()]
    out["all_pass_60db"] = bool(all(s is not None and s >= 60.0 for s in snrs))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--roofline-reps", type=int, default=12,
                   help="paired roofline reps (>= 12 per the r5 protocol)")
    p.add_argument("--skip", default="")
    args = p.parse_args()
    skip = set(args.skip.split(","))
    tag = f"r{args.round:02d}"
    os.makedirs(RECORDS, exist_ok=True)

    if "roofline" not in skip:
        write(os.path.join(RECORDS, f"roofline_{tag}.json"),
              do_roofline(args.roofline_reps))
    if "bench" not in skip:
        write(os.path.join(RECORDS, f"bench_{tag}.json"), do_bench(args.reps))
    if "configs" not in skip:
        write(os.path.join(RECORDS, f"configs_{tag}.json"), do_configs())


if __name__ == "__main__":
    main()
