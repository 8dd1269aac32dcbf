#!/usr/bin/env python
"""Print the canonical per-metric numbers from the newest round records
(VERDICT r4 item 5: one canonical number per metric).

The rule (docs/PERF.md "Canonical-number rule"): docs/records/*_rNN.json
are the source of truth; prose quotes THESE cells.  This tool prints a
markdown-ready block from the newest record of each kind so PERF.md /
BASELINE.md tables can be regenerated instead of hand-copied.

Run: python tools/gen_perf_cells.py [--round N]
"""

import argparse
import glob
import json
import os
import re

RECORDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "records")


def newest(kind, ext="json", upto=None):
    best, path = None, None
    for p in glob.glob(os.path.join(RECORDS, f"{kind}_r*.{ext}")):
        m = re.search(rf"{kind}_r(\d+)", p)
        if m and (upto is None or int(m.group(1)) <= upto):
            if best is None or int(m.group(1)) > best:
                best, path = int(m.group(1)), p
    return (best, path) if path else (None, None)


def load(path):
    with open(path) as f:
        if path.endswith(".jsonl"):
            return [json.loads(ln) for ln in f if ln.strip()]
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None,
                    help="cap the record search at this round")
    args = ap.parse_args()

    rnd, p = newest("bench", upto=args.round)
    if p:
        d = load(p)
        print(f"## bench (bench_r{rnd:02d}.json medians — canonical)")
        for mode, v in d.get("modes", {}).items():
            print(f"- {mode}: **{v['median']/1e9:.3f}e9** samples/s/chip "
                  f"(n={len(v.get('values', []))}, min {v['min']/1e9:.3f} / "
                  f"max {v['max']/1e9:.3f})")

    rnd, p = newest("roofline", upto=args.round)
    if p:
        d = load(p)
        g = d.get("gate", {})
        proto = g.get("protocol", "raw")
        med = g.get("paired_frac_median", g.get("raw_frac_median"))
        print(f"\n## roofline (roofline_r{rnd:02d}.json — canonical)")
        print(f"- gate ({proto}): median **{med}** of "
              f"{g.get('pooled_reps', '?')} pooled reps vs target "
              f"{g.get('target')} -> pass={g.get('pass')}")

    rnd, p = newest("selfcheck", upto=args.round)
    if p:
        d = load(p)
        vals = {k: v for k, v in d.items()
                if isinstance(v, (int, float)) and not isinstance(v, bool)}
        lo = min(vals, key=vals.get)
        print(f"\n## selfcheck (selfcheck_r{rnd:02d}.json — canonical)")
        print(f"- {len(vals)} rows, min **{vals[lo]} dB** ({lo}), "
              f"all_pass_60db={d.get('all_pass_60db')}")

    rnd, p = newest("configs", upto=args.round)
    if p:
        d = load(p)
        print(f"\n## configs (configs_r{rnd:02d}.json — canonical)")
        for k, v in d.get("configs", {}).items():
            print(f"- {k}: snr {v.get('snr_db_vs_oracle')} dB, "
                  f"{v.get('samples_per_s', 0)/1e6:.1f}e6 samples/s e2e")

    for suffix in ("bf16x3", "bf16x3_pq87", "composite"):
        best, path = None, None
        for q in glob.glob(os.path.join(RECORDS,
                                        f"soak_r*_{suffix}.json")):
            m = re.search(r"soak_r(\d+)_", q)
            if m and (args.round is None or int(m.group(1)) <= args.round):
                if best is None or int(m.group(1)) > best:
                    best, path = int(m.group(1)), q
        if path:
            d = load(path)
            key = [k for k in d if k.endswith("_overall_db")]
            cells = ", ".join(f"{k}={d[k]}" for k in key)
            print(f"\n## soak {suffix} (r{best:02d} — canonical): "
                  f"blocks={d.get('blocks')}, {cells}, "
                  f"pass={d.get('pass_60db')}")


if __name__ == "__main__":
    main()
