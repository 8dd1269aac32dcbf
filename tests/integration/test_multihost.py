"""CI smoke for the multi-host harness (SURVEY.md §2 P6/P7): keeps the
>=90% 1->4-host scaling measurement (BASELINE.json:5) one command away —
the full multi-process collective path (jax.distributed control plane,
per-process mesh, ppermute halos across process boundaries) runs on
simulated CPU hosts every CI run."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_simulated_two_host_config4():
    """2 simulated hosts x 4 virtual devices: config 4 (4096-tap halo
    overlap-save) passes its own >=60 dB parity check across the
    process boundary.  Retries: the real jax.distributed control plane
    between the two simulated processes can hit connect/allgather or
    gloo key-value deadlines (fixed 30 s) when the machine is heavily
    loaded (observed under a concurrent interpret-mode suite) — fresh
    attempts on new ports distinguish transient timing from a genuine
    sharded-program regression."""
    env = dict(os.environ)
    env["ASP_INTERPRET_PALLAS"] = "1"
    for attempt, port in enumerate(("9833", "9834", "9835")):
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "tools", "launch_multihost.py"),
             "--simulate", "2", "--devices-per-host", "4", "--port", port,
             "--",
             os.path.join(REPO, "tools", "run_config_4.py"),
             "--check", "--json", "--seconds", "1"],
            capture_output=True, text=True, env=env, timeout=850,
        )
        if r.returncode == 0:
            break
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    recs = [json.loads(l) for l in r.stdout.splitlines()
            if l.startswith("{") and "snr_db_vs_oracle" in l]
    assert recs, r.stdout[-2000:]
    assert all(rec["parity"] for rec in recs)


def test_scaling_harness_functional():
    """benchmarks/scaling.py sweeps 1..8 virtual devices and emits the
    efficiency report (functional smoke; perf numbers need real chips)."""
    env = dict(os.environ)
    env["ASP_INTERPRET_PALLAS"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["ASP_FORCE_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "scaling.py"),
         "--channels", "8", "--per-shard", str(147 * 32), "--json", "--iters", "2"],
        capture_output=True, text=True, env=env, timeout=850,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout[-2000:]}\nstderr:\n{r.stderr[-2000:]}"
    rows = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    ndevs = {row["devices"] for row in rows if "devices" in row}
    assert {1, 2, 4, 8} <= ndevs, rows
