#!/usr/bin/env python
"""Profile-guided tile tuning for the fused kernels (docs/ROADMAP.md).

The wrappers pick batch/frame tiles from an analytic VMEM model
(fft_kernel.vmem_tile_cap, budget ASP_VMEM_MB).  This tool measures the
real thing: it sweeps (batch_tile, frames_per_step) for one kernel and
geometry ON THE CURRENT BACKEND with the on-device fori_loop timing
method (naive host timing is invalid through the relay — see bench.py),
reporting one JSON line per working config and the best at the end.
Configs that fail to compile (Mosaic VMEM exceeded) are reported, not
fatal — that is the measured VMEM ceiling the analytic model
approximates.

Usage:
    python tools/tune_tiles.py --kernel chain --nfft 1024 --channels 64 \
        --batch-tiles 8,16,32,64 --frame-tiles 8,16,32,64

Apply a winner by passing batch_tile=/frames_per_step= explicitly at the
call site, or adjust ASP_VMEM_MB to move every kernel's analytic caps.

Unless the caller already set ASP_VMEM_MB, the sweep lifts the analytic
VMEM budget out of the way (512 MB): the whole point is to measure the
REAL Mosaic ceiling, so requested tiles must reach the kernel unclamped
rather than being silently capped to the model's answer.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# lift the analytic cap so requested tiles actually run (see module doc);
# must happen before any kernel call (vmem_budget_bytes reads it per call)
os.environ.setdefault("ASP_VMEM_MB", "512")

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

from audiosignalprocess_tpu.utils.validate import check


def parse_ints(s: str):
    return [int(v) for v in s.split(",") if v]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kernel", default="chain",
                   choices=("chain", "gate", "os", "resample"),
                   help="fused kernel to tune")
    p.add_argument("--nfft", type=int, default=1024)
    p.add_argument("--hop", type=int, default=256)
    p.add_argument("--taps", type=int, default=64)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batch-tiles", default="8,16,32,64")
    p.add_argument("--frame-tiles", default="8,16,32",
                   help="frames/blocks per grid step (os: blocks_per_step)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from audiosignalprocess_tpu.cpu_ref import oracle

    h = oracle.design_fir(args.taps, 0.3)
    n = (int(args.seconds * 48000) // args.hop) * args.hop
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.channels, n)).astype(np.float32))
    # timed input derived ON-DEVICE (the transport defers fresh host-array
    # uploads into the first consuming call — CLAUDE.md gotcha) and
    # materialized by a scalar fetch before any timing
    x2 = x * jnp.float32(1.000001)
    float(jnp.sum(jnp.abs(x2[:, :64])))

    def make_fn(tb, mf):
        if args.kernel == "chain":
            from audiosignalprocess_tpu.kernels.chain_kernel import (
                fir_noise_gate_fused,
            )
            return lambda v: fir_noise_gate_fused(
                v, h, args.nfft, args.hop, noise_frames=8,
                frames_per_step=mf, batch_tile=tb)
        if args.kernel == "gate":
            from audiosignalprocess_tpu.kernels.gate_kernel import (
                noise_gate_fused,
            )
            return lambda v: noise_gate_fused(
                v, args.nfft, args.hop, noise_frames=8,
                frames_per_step=mf, batch_tile=tb)
        if args.kernel == "os":
            from audiosignalprocess_tpu.kernels.os_kernel import (
                overlap_save_fused,
            )
            return lambda v: overlap_save_fused(
                v, h, args.nfft, blocks_per_step=mf, batch_tile=tb)
        from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac
        return lambda v: resample_mac(v, 160, 147, cycle_tile=16 * mf,
                                      batch_tile=tb)

    def timed(fn):
        @jax.jit
        def loop(v):
            def body(_, carry):
                y = fn(carry)[..., : carry.shape[-1]]
                pad = carry.shape[-1] - y.shape[-1]
                yp = jnp.pad(y, ((0, 0), (0, pad))) if pad else y
                return carry + 1e-12 * yp

            return jnp.sum(jnp.abs(lax.fori_loop(0, args.iters, body, v)[:, :256]))

        float(loop(x))  # compile + warm
        t0 = time.perf_counter()
        cs = float(loop(x2))
        dt = (time.perf_counter() - t0) / args.iters
        check(np.isfinite(cs), f"non-finite checksum: {cs}")
        return args.channels * n / dt

    best = None
    for tb in parse_ints(args.batch_tiles):
        for mf in parse_ints(args.frame_tiles):
            rec = {"kernel": args.kernel, "batch_tile": tb}
            if args.kernel == "resample":
                # resample_mac takes cycle_tile (supercycles per grid
                # step), not frames_per_step, and has no FFT geometry
                rec["cycle_tile"] = 16 * mf
            else:
                rec["nfft"] = args.nfft
                rec["frames_per_step"] = mf
            try:
                sps = timed(make_fn(tb, mf))
                rec["samples_per_s"] = round(sps, 1)
                if best is None or sps > best["samples_per_s"]:
                    best = rec
            except Exception as e:  # Mosaic VMEM / layout errors: report
                rec["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(json.dumps(rec), flush=True)
    if best is None:
        print(json.dumps({"best": None}))
        return 1
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
