"""The cross-round regression gate's decision logic (tools/
check_regression.py), exercised against synthetic record trees.

The checker is the round's safety net; its round-5 additions (bench
band noise floor, soak length-comparability skip, acknowledged
findings, explicit missing-baseline findings, ring clean-run band) each
changed a pass/fail decision and are pinned here so a refactor cannot
silently flip them back.
"""

import json
import os
import subprocess
import sys

import pytest

TOOL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tools",
    "check_regression.py")


_CALL = [0]


def run_gate(tmp_path, records, rnd, against=None):
    """Run the checker against a synthetic docs/records tree by pointing
    its RECORDS constant at a FRESH directory per call (record trees
    from earlier calls in the same test must not leak in)."""
    _CALL[0] += 1
    rec_dir = tmp_path / f"records{_CALL[0]}"
    rec_dir.mkdir(exist_ok=True)
    for name, obj in records.items():
        with open(rec_dir / name, "w") as f:
            if name.endswith(".jsonl"):
                for row in obj:
                    f.write(json.dumps(row) + "\n")
            else:
                json.dump(obj, f)
    wrapper = tmp_path / "wrap.py"
    wrapper.write_text(
        "import runpy, sys\n"
        "import importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('cr', {str(TOOL)!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        f"m.RECORDS = {str(rec_dir)!r}\n"
        "sys.argv = ['cr'] + sys.argv[1:]\n"
        "m.main()\n")
    argv = [sys.executable, str(wrapper), "--round", str(rnd)]
    if against is not None:
        argv += ["--against", str(against)]
    res = subprocess.run(argv, capture_output=True, text=True)
    out = json.loads(res.stdout)
    return res.returncode, out


def bench(med, lo=None, hi=None, n=3):
    lo = med if lo is None else lo
    hi = med if hi is None else hi
    return {"modes": {"chain": {"values": [lo, med, hi][:n], "min": lo,
                                "median": med, "max": hi}}}


def test_band_noise_floor(tmp_path):
    """A median 1% below a degenerate band must NOT fire (slot noise);
    3% below MUST fire."""
    recs = {"bench_r01.json": bench(1000.0, 999.0, 1001.0)}
    rc, out = run_gate(tmp_path, {**recs,
                                  "bench_r02.json": bench(989.0)}, 2)
    assert rc == 0 and out["ok"], out
    rc, out = run_gate(tmp_path, {**recs,
                                  "bench_r02.json": bench(968.0)}, 2)
    assert rc == 1 and not out["ok"]
    assert any(f["record"] == "bench" for f in out["findings"])


def test_soak_length_mismatch_skips(tmp_path):
    """overall_db is only comparable at equal block counts: a longer
    soak reading lower must not fire, and the skip must be visible."""
    recs = {
        "soak_r01_bf16x3.json": {"blocks": 128, "pass_60db": True,
                                 "fused_bf16x3_overall_db": 103.2},
        "soak_r02_bf16x3.json": {"blocks": 512, "pass_60db": True,
                                 "fused_bf16x3_overall_db": 95.0},
    }
    rc, out = run_gate(tmp_path, recs, 2)
    assert rc == 0 and out["ok"], out
    assert "SKIPPED" in out["compared"].get("soak", "")
    # equal lengths: the same drop IS a finding
    recs["soak_r02_bf16x3.json"]["blocks"] = 128
    rc, out = run_gate(tmp_path, recs, 2)
    assert rc == 1 and not out["ok"]


def test_acknowledged_findings_pass_but_stay_visible(tmp_path):
    recs = {
        "bench_r01.json": bench(1000.0, 999.0, 1001.0),
        "bench_r02.json": bench(900.0),
        "acknowledged_r02.json": [
            {"record": "bench", "key": "chain", "reason": "measured trade"}
        ],
    }
    rc, out = run_gate(tmp_path, recs, 2)
    assert rc == 0 and out["ok"]
    assert out["acknowledged"] == 1
    assert out["findings"][0]["acknowledged"] == "measured trade"


def test_explicit_against_missing_baseline_fires(tmp_path):
    recs = {"bench_r03.json": bench(1000.0)}
    rc, out = run_gate(tmp_path, recs, 3, against=2)
    assert rc == 1
    assert any(f["key"] == "baseline_missing" for f in out["findings"])
    # ...but NOT when the current round lacks the record kind too
    rc, out = run_gate(tmp_path, {"selfcheck_r03.json": {
        "backend": "x", "k": 100.0, "all_pass_60db": True}}, 3, against=2)
    assert all(f["record"] != "bench" for f in out["findings"])


def test_ring_clean_run_band(tmp_path):
    """A current value inside the baseline's recorded clean-run band
    must not fire even when it is >10% below the median."""
    recs = {
        "ring_r01.json": {"samples_per_s": 2.79e6,
                          "values_samples_per_s": [1.96e6, 2.79e6, 3.61e6]},
        "ring_r02.json": {"samples_per_s": 2.1e6},
    }
    rc, out = run_gate(tmp_path, recs, 2)
    assert rc == 0 and out["ok"], out
    recs["ring_r02.json"]["samples_per_s"] = 1.5e6  # below band floor
    rc, out = run_gate(tmp_path, recs, 2)
    assert rc == 1 and not out["ok"]


def test_absolute_60db_violation_fires_without_baseline(tmp_path):
    rc, out = run_gate(tmp_path, {"selfcheck_r01.json": {
        "backend": "tpu", "some_kernel": 58.3, "all_pass_60db": False}}, 1)
    assert rc == 1
    keys = {f["key"] for f in out["findings"]}
    assert "some_kernel" in keys and "all_pass_60db" in keys
