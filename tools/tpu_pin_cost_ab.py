#!/usr/bin/env python
"""On-chip throughput cost of the round-5 default pins (gpre + vfft):
interleaved A/B of ASP_MATMUL_PIN=<default> vs none on the benches the
new pins touch — the headline whole-file chain (fir_noise_gate_fused),
the one-kernel streaming chain (stream1), the standalone two-kernel path
(mode True: overlap_save_fused + noise_gate_fused), and the fused
streaming vocoder step (not a bench.py mode; measured here with the same
on-device fori_loop + scalar-checksum methodology).

The composite modes (res_step/res_env_step) were costed in round 4
(pin_ab_r04.json) and their families are unchanged; this tool measures
what round 5 added.  Arms are interleaved per mode so chip-share drift
cancels from the ratio.

Run: python tools/tpu_pin_cost_ab.py [--reps 3] [--json-out PATH]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json
import statistics
import time

import numpy as np

MODES = ["chain", "stream1", "True"]


def bench_stretch(iters: int = 10):
    """Fused streaming vocoder throughput (samples/s/chip), on-device
    scan loop with a data dependency + scalar checksum (CLAUDE.md
    timing rule)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from audiosignalprocess_tpu.pipeline import Chain, StretchStage

    chain = Chain([StretchStage(p=4, q=3, nfft=1024, hop=256, fused=True)])
    chain.build()
    n = 2048 * 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, n)).astype(np.float32))
    # device-derived timed input (transport defers fresh host uploads
    # into the consuming call — CLAUDE.md); materialized below after
    # the warm call

    @jax.jit
    def loop(v):
        def body(_, carry):
            y = chain.stream(carry, 2048)
            pad = carry.shape[-1] - y.shape[-1]
            yp = jnp.pad(y, ((0, 0), (0, pad))) if pad > 0 \
                else y[..., : carry.shape[-1]]
            return carry + 1e-12 * yp

        return jnp.sum(jnp.abs(lax.fori_loop(0, iters, body, v)[:, :256]))

    float(loop(x))
    x2 = x * jnp.float32(1.000001)
    float(jnp.sum(jnp.abs(x2[:, :64])))
    t0 = time.perf_counter()
    float(loop(x2))
    dt = (time.perf_counter() - t0) / iters
    return 16 * n / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    import jax

    import bench

    print(json.dumps({"backend": jax.default_backend(),
                      "modes": MODES + ["stretch_step"]}), flush=True)
    rows = []
    for mode in MODES + ["stretch_step"]:
        for rep in range(args.reps):
            for pin in ("default", "none"):
                if pin == "none":
                    os.environ["ASP_MATMUL_PIN"] = "none"
                else:
                    os.environ.pop("ASP_MATMUL_PIN", None)
                if mode == "stretch_step":
                    sps = bench_stretch()
                else:
                    m = {"True": True}.get(mode, mode)
                    sps, _ = bench.bench_fir_stft_chain(fused=m)
                r = {"mode": mode, "pin": pin, "rep": rep,
                     "samples_per_s": round(sps, 1)}
                rows.append(r)
                print(json.dumps(r), flush=True)
    summary = {}
    for mode in MODES + ["stretch_step"]:
        med = {}
        for pin in ("default", "none"):
            vals = [r["samples_per_s"] for r in rows
                    if r["mode"] == mode and r["pin"] == pin]
            med[pin] = statistics.median(vals)
        summary[mode] = {
            "default_median": med["default"], "none_median": med["none"],
            "pin_cost_pct": round(100 * (1 - med["default"] / med["none"]), 1),
        }
        print(json.dumps({mode: summary[mode]}), flush=True)
    out = {"rows": rows, "summary": summary}
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"wrote {args.json_out}", flush=True)


if __name__ == "__main__":
    main()
