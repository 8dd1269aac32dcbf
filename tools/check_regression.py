#!/usr/bin/env python
"""Cross-round perf/parity regression gate (VERDICT r3 item 5).

Diffs round N's records in docs/records/ against round N-1 (or the most
recent earlier round that has each record) and prints every:
  - kernel/geometry/config SNR drop > 5 dB (selfcheck_rNN.json,
    geomsweep_rNN.jsonl, configs_rNN.json)
  - bench-mode median throughput below the previous round's recorded
    [min, max] noise band (bench_rNN.json); when the previous round has
    no band (single-shot legacy number), falls back to a 10% threshold
  - roofline gate flip (pass -> fail) or median raw_frac drop > 0.05

Exit 0 = no regressions (findings list empty).  Quote the output in
docs/PERF.md per round.

Run: python tools/check_regression.py --round 4 [--against 3]
"""

import argparse
import glob
import json
import os
import re
import sys

RECORDS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "records")

SNR_DROP_DB = 5.0
SNR_BOUND_DB = 60.0  # BASELINE.json:5 — an absolute violation is a
                     # finding even with zero cross-round drop
FALLBACK_TP_DROP = 0.10
# cross-slot noise floor under a bench band: within-run spread on this
# chip is routinely <0.1 % while run-to-run slot variance is a few
# percent (round-5 finding: res_env_step 0.17 % "below" a 0.1 %-wide
# r4 band in a different slot) — a band tighter than the slot noise
# must not fire on slot noise
BAND_NOISE_FRAC = 0.02

_LOAD_ERRORS = []


def load(name):
    """Parse a record; an unreadable/empty/corrupt file is itself a
    finding (a timed-out sweep step must not read as a clean round)."""
    path = os.path.join(RECORDS, name)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            if name.endswith(".jsonl"):
                return [json.loads(ln) for ln in f if ln.strip()]
            return json.load(f)
    except (json.JSONDecodeError, OSError) as e:
        _LOAD_ERRORS.append({"record": name,
                             "error": f"{type(e).__name__}: {e}"[:200]})
        return None


def prev_round(kind, ext, this_round):
    """Most recent round < this_round that has the record."""
    best = None
    for p in glob.glob(os.path.join(RECORDS, f"{kind}_r*.{ext}")):
        m = re.search(rf"{kind}_r(\d+)\.{ext}$", p)
        if m and int(m.group(1)) < this_round:
            best = max(best or 0, int(m.group(1)))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--against", type=int, default=None,
                    help="explicit baseline round (default: latest earlier)")
    args = ap.parse_args()
    n = args.round
    findings = []
    compared = {}

    def base_for(kind, ext="json", cur_exists=True):
        b = args.against if args.against is not None else prev_round(
            kind, ext, n)
        if not b:
            return None, None
        rec = load(f"{kind}_r{b:02d}.{ext}")
        # an EXPLICIT --against whose baseline record does not exist must
        # be a finding, not a silent skip: a typoed round number would
        # otherwise make a regressing round read as clean
        if rec is None and args.against is not None and cur_exists:
            findings.append({"record": kind, "key": "baseline_missing",
                             "against": b,
                             "note": f"--against {b} given but "
                                     f"{kind}_r{b:02d}.{ext} is absent/"
                                     "unreadable — comparison skipped"})
        return rec, b

    def is_snr(v):
        # bools are ints in Python: exclude pass flags from numeric
        # comparison (False < True - 5 never fires; flips are checked
        # explicitly below)
        return isinstance(v, (int, float)) and not isinstance(v, bool)

    # --- selfcheck: per-kernel SNRs (absolute bound + cross-round drop
    # + pass-flag flip + kernels that vanished from the record)
    cur = load(f"selfcheck_r{n:02d}.json")
    prev, b = base_for("selfcheck", cur_exists=cur is not None)
    if cur:
        for k, v in cur.items():
            if is_snr(v) and v < SNR_BOUND_DB:
                findings.append({"record": "selfcheck", "key": k,
                                 "cur_db": v, "note": "below 60 dB bound"})
        if cur.get("all_pass_60db") is False:
            findings.append({"record": "selfcheck", "key": "all_pass_60db",
                             "cur": False})
    if cur and prev:
        compared["selfcheck"] = f"r{n:02d} vs r{b:02d}"
        for k, v in prev.items():
            if not is_snr(v) or k == "backend":
                continue
            if k not in cur or not is_snr(cur.get(k)):
                findings.append({"record": "selfcheck", "key": k,
                                 "prev_db": v, "cur_db": "MISSING"})
            elif cur[k] < v - SNR_DROP_DB:
                findings.append({"record": "selfcheck", "key": k,
                                 "prev_db": v, "cur_db": cur[k]})

    # --- geomsweep: per-case SNRs (jsonl)
    curg = load(f"geomsweep_r{n:02d}.jsonl")
    bg = args.against if args.against is not None else prev_round(
        "geomsweep", "jsonl", n)
    prevg = load(f"geomsweep_r{bg:02d}.jsonl") if bg else None
    if bg and prevg is None and args.against is not None and curg:
        findings.append({"record": "geomsweep", "key": "baseline_missing",
                         "against": bg,
                         "note": f"--against {bg} given but "
                                 f"geomsweep_r{bg:02d}.jsonl is absent/"
                                 "unreadable — comparison skipped"})
    if curg:
        for r in curg:
            if "case" in r and not r.get("pass", True):
                findings.append({"record": "geomsweep", "key": r["case"],
                                 "cur": r, "note": "case failing"})
    if curg and prevg:
        compared["geomsweep"] = f"r{n:02d} vs r{bg:02d}"
        curmap = {r["case"]: r.get("snr_db") for r in curg if "case" in r}
        for r in prevg:
            c, v = r.get("case"), r.get("snr_db")
            if c is None or v is None:
                continue
            cv = curmap.get(c)
            if cv is None:
                findings.append({"record": "geomsweep", "key": c,
                                 "prev_db": v, "cur_db": "MISSING"})
            elif cv < v - SNR_DROP_DB:
                findings.append({"record": "geomsweep", "key": c,
                                 "prev_db": v, "cur_db": cv})

    # --- configs: SNR + throughput rows
    cur = load(f"configs_r{n:02d}.json")
    prev, b = base_for("configs", cur_exists=cur is not None)
    if cur:
        for k, v in cur.get("configs", {}).items():
            s = v.get("snr_db_vs_oracle")
            if "error" in v or (s is not None and s < SNR_BOUND_DB) \
                    or v.get("parity") is False:
                findings.append({"record": "configs", "key": k, "cur": v,
                                 "note": "absolute parity failure"})
    if cur and prev:
        compared["configs"] = f"r{n:02d} vs r{b:02d}"
        for k, pv in prev.get("configs", {}).items():
            cv = cur.get("configs", {}).get(k, {})
            ps, cs = pv.get("snr_db_vs_oracle"), cv.get("snr_db_vs_oracle")
            if ps is not None and cs is not None and cs < ps - SNR_DROP_DB:
                findings.append({"record": "configs", "key": k,
                                 "prev_db": ps, "cur_db": cs})

    # --- bench: median vs previous noise band
    cur = load(f"bench_r{n:02d}.json")
    prev, b = base_for("bench", cur_exists=cur is not None)
    if cur and prev:
        compared["bench"] = f"r{n:02d} vs r{b:02d}"
        for mode, pv in prev.get("modes", {}).items():
            cv = cur.get("modes", {}).get(mode)
            if not cv:
                continue
            med = cv["median"]
            lo = pv.get("min")
            if lo is not None and len(pv.get("values", [])) > 1:
                if med < lo * (1 - BAND_NOISE_FRAC):
                    findings.append({"record": "bench", "key": mode,
                                     "prev_band": [pv["min"], pv["max"]],
                                     "cur_median": med,
                                     "note": f"below band floor "
                                             f"(min x {1 - BAND_NOISE_FRAC})"})
            elif med < pv["median"] * (1 - FALLBACK_TP_DROP):
                findings.append({"record": "bench", "key": mode,
                                 "prev_median": pv["median"],
                                 "cur_median": med,
                                 "note": "fallback 10% threshold"})

    # --- ring mode: config-5 ring-driver throughput (measure_round step)
    cur = load(f"ring_r{n:02d}.json")
    prev, b = base_for("ring", cur_exists=cur is not None)
    if cur and prev:
        compared["ring"] = f"r{n:02d} vs r{b:02d}"
        ps, cs = prev.get("samples_per_s"), cur.get("samples_per_s")
        # ring mode is a TRANSPORT measurement first (ring_r04.json's
        # own note): when the baseline recorded its clean-run spread,
        # judge against the low edge of that band, not the median
        vals = prev.get("values_samples_per_s") or []
        floor = min(vals) * (1 - BAND_NOISE_FRAC) if len(vals) > 1 else (
            ps * (1 - FALLBACK_TP_DROP) if ps else None)
        if floor and cs and cs < floor:
            findings.append({"record": "ring", "key": "samples_per_s",
                             "prev": ps, "cur": cs,
                             "prev_clean_band": ([min(vals), max(vals)]
                                                 if vals else None),
                             "note": "below the baseline clean-run band"})
        psnr, csnr = (prev.get("snr_db_vs_oracle"),
                      cur.get("snr_db_vs_oracle"))
        if psnr is not None and csnr is not None \
                and csnr < psnr - SNR_DROP_DB:
            findings.append({"record": "ring", "key": "snr_db_vs_oracle",
                             "prev_db": psnr, "cur_db": csnr})

    # --- vocoder long-stream soak (bf16x3 shipping precision)
    cur = load(f"soak_r{n:02d}_bf16x3.json")
    if cur is not None:
        if cur.get("pass_60db") is False:
            findings.append({"record": "soak", "key": "pass_60db",
                             "cur": cur.get("fused_bf16x3_overall_db")})
        # soak files are soak_rNN_bf16x3.json: pick by ROUND NUMBER
        # (int-compared like prev_round — lexicographic sort breaks at
        # r100), honoring --against like every other record type
        by_round = {}
        for c in glob.glob(os.path.join(RECORDS, "soak_r*_bf16x3.json")):
            m_ = re.search(r"soak_r(\d+)_", c)
            if m_ and int(m_.group(1)) < n:
                by_round[int(m_.group(1))] = os.path.basename(c)
        want = args.against if args.against is not None else \
            (max(by_round) if by_round else None)
        if want is not None and want not in by_round \
                and args.against is not None:
            findings.append({"record": "soak", "key": "baseline_missing",
                             "against": want,
                             "note": f"--against {want} given but no "
                                     f"soak_r{want:02d}_bf16x3.json — "
                                     "comparison skipped"})
        if want in by_round:
            prev = load(by_round[want])
            if prev:
                # soak SNR falls ~3 dB per stream-length DOUBLING (the
                # measured sqrt drift law), so overall_db is comparable
                # only between equal-length soaks.  A length change is
                # recorded as incomparable, not silently diffed: a real
                # drift regression must not hide behind a longer (or
                # shorter) protocol, and a protocol change must not
                # read as a regression.
                pb, cb = prev.get("blocks"), cur.get("blocks")
                if pb != cb:
                    compared["soak"] = (f"r{n:02d} vs {by_round[want]} "
                                        f"SKIPPED: block counts differ "
                                        f"({cb} vs {pb}) — overall_db not "
                                        "comparable across lengths")
                else:
                    compared["soak"] = f"r{n:02d} vs " + by_round[want]
                    pv = prev.get("fused_bf16x3_overall_db")
                    cv = cur.get("fused_bf16x3_overall_db")
                    if pv is not None and cv is not None \
                            and cv < pv - SNR_DROP_DB:
                        findings.append({"record": "soak",
                                         "key": "fused_bf16x3_overall_db",
                                         "prev_db": pv, "cur_db": cv})

    # --- roofline gate
    cur = load(f"roofline_r{n:02d}.json")
    prev, b = base_for("roofline", cur_exists=cur is not None)
    if cur:
        gate = cur.get("gate", {})
        if not gate.get("pass"):
            findings.append({"record": "roofline", "key": "gate",
                             "cur": gate, "note": "median below target"})
        if prev:
            compared["roofline"] = f"r{n:02d} vs r{b:02d}"
            pm = prev.get("gate", {}).get("raw_frac_median")
            cm = gate.get("raw_frac_median")
            if pm is not None and cm is not None and cm < pm - 0.05:
                findings.append({"record": "roofline", "key": "raw_frac",
                                 "prev_median": pm, "cur_median": cm})

    for e in _LOAD_ERRORS:
        findings.append({"record": e["record"], "key": "unreadable",
                         "error": e["error"],
                         "note": "empty/corrupt record file — a failed "
                                 "sweep step must not read as clean"})

    # acknowledged regressions: docs/records/acknowledged_rNN.json lists
    # {"record": ..., "key": ..., "reason": ...} entries for findings
    # that are EXPECTED this round (e.g. a deliberate accuracy/throughput
    # trade measured and documented in PERF.md).  Acknowledged findings
    # stay in the output — visibly, with their reason — but do not fail
    # the gate; anything unacknowledged still does.
    acks = load(f"acknowledged_r{n:02d}.json") or []
    ackmap = {(a.get("record"), a.get("key")): a.get("reason", "")
              for a in acks}
    live = []
    for f in findings:
        reason = ackmap.get((f.get("record"), f.get("key")))
        if reason is not None:
            f["acknowledged"] = reason
        else:
            live.append(f)
    print(json.dumps({"round": n, "compared": compared,
                      "findings": findings,
                      "acknowledged": len(findings) - len(live),
                      "ok": not live}, indent=1))
    sys.exit(1 if live else 0)


if __name__ == "__main__":
    main()
