#!/usr/bin/env python
"""FFT roofline harness (BASELINE.json:2,5): measured GFLOP/s and achieved
HBM bandwidth vs the per-chip speed-of-light bound, for each FFT impl.

Batched small-N FFTs are memory-bound: speed-of-light = move each complex
element in and out of HBM once (utils/metrics.py).  The ≥80%-of-roofline
target applies to the performance path (impl="matmul"/"pallas").

Usage: python benchmarks/roofline.py [--impls matmul,pallas] [--json]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor ASP_FORCE_PLATFORM (the TPU plugin ignores JAX_PLATFORMS; only
# jax.config works, and it must run before backend init — CLAUDE.md)
_plat = os.environ.get("ASP_FORCE_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.utils.metrics import detect_chip, fft_roofline_bytes


def bench_fft(impl: str, batch: int, n: int, iters: int = 20, complex_in=True):
    """On-device iteration loop with a data dependency + scalar-checksum
    host fetch: remote/relayed execution backends neither run identical
    RPCs twice nor block in block_until_ready, so naive host-loop timing
    reads as pure dispatch latency."""
    rng = np.random.default_rng(0)
    # host<->device stays REAL throughout (some TPU transports do not
    # implement complex transfers); complex values are formed on-device.
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    if complex_in:
        def op(vr):
            y = fft_ops.fft(vr + 1j * (0.5 * vr), impl=impl)
            return jnp.real(y) + jnp.imag(y)
        byts = fft_roofline_bytes(batch, n, 4, complex_io=True)
    else:
        def op(vr):
            y = fft_ops.rfft(vr, impl=impl)
            yr = jnp.real(y) + jnp.imag(y)  # (..., n//2+1)
            return jnp.pad(yr, ((0, 0), (0, n - yr.shape[-1])))
        # real in (4B) + complex half-spectrum out (~4B/sample again)
        byts = batch * n * 4 + batch * (n // 2 + 1) * 8

    @jax.jit
    def loop(v):
        def body(_, carry):
            y = op(carry)
            return carry + 1e-12 * y[..., : carry.shape[-1]]
        out = jax.lax.fori_loop(0, iters, body, v)
        return jnp.sum(jnp.abs(out[..., :64]))

    x2 = x * 1.0001
    float(loop(x))  # compile + warm
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(x2 * (1.0 + 1e-6 * r)))
        best = min(best, (time.perf_counter() - t0) / iters)
    dt = best
    if complex_in:
        flops = batch * fft_ops.fft_flops(n)
    else:
        # real transform: one n/2-point complex FFT + O(n) pack/untangle
        # (using the full-n complex formula would double-count the work)
        flops = batch * (fft_ops.fft_flops(n // 2) + 4 * n)
    return dt, flops / dt / 1e9, byts / dt / 1e9


def measure_iteration_floor_ms(iters: int = 40) -> float:
    """Fixed per-`fori_loop`-iteration cost of this backend/transport
    (~1.4 ms on the relay-attached chip; docs/PERF.md).  Measured with
    the SAME data-dependent loop harness over a trivially small op, so
    the number is exactly the constant that inflates every bench_fft
    row.  Subtracting it gives the marginal (kernel-only) time."""
    x = jnp.asarray(np.ones((8, 128), np.float32))

    @jax.jit
    def loop(v):
        def body(_, c):
            return c * 1.0000001 + 1e-12
        return jnp.sum(jax.lax.fori_loop(0, iters, body, v))

    float(loop(x))  # compile + warm
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        float(loop(x * (1.0 + 1e-6 * r)))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def measure_achievable_gbps(iters: int = 16, floor_ms: float = 0.0):
    """Measured elementwise HBM bandwidth (read+write a 256 MB array):
    the honest speed-of-light denominator.  Shared/relayed or throttled
    devices can deliver a small fraction of the spec-sheet number; kernel
    efficiency must be judged against what the chip actually sustains.

    Returns (raw, marginal) GB/s from the same probe: ``raw`` divides by
    the full per-iteration time (the denominator for the RAW SoL/meas
    ratio) and ``marginal`` subtracts ``floor_ms`` — the fixed dispatch
    cost — the same way marginal_frac subtracts it from the kernel rows.
    A marginal numerator over the raw denominator would otherwise
    overstate the ratio (it can exceed 1.0 on a heavily shared chip)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((64, 1 << 20)).astype(np.float32))

    @jax.jit
    def ew(v):
        def body(_, c):
            return c * 0.999999 + 1e-9
        return jnp.sum(jax.lax.fori_loop(0, iters, body, v)[:, :64])

    float(ew(x))
    best = np.inf
    for r in range(3):
        t0 = time.perf_counter()
        float(ew(x * (1.0 + 1e-6 * r)))
        best = min(best, (time.perf_counter() - t0) / iters)
    byts = 2 * x.size * 4
    best_m = max(best - floor_ms * 1e-3, 1e-9)
    return byts / best / 1e9, byts / best_m / 1e9


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impls", default="matmul,pallas,pallas_r2,radix2,xla")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--sizes", default="256,1024,4096")
    p.add_argument("--rfft", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()
    chip = detect_chip()
    floor_ms = measure_iteration_floor_ms()
    meas, meas_m = measure_achievable_gbps(floor_ms=floor_ms)
    # stream every row as it completes (the relayed chip compiles slowly;
    # a buffered report loses everything on timeout)
    if args.json:
        print(json.dumps({"achievable_gbps": round(meas, 1),
                          "achievable_marginal_gbps": round(meas_m, 1),
                          "spec_gbps": chip.hbm_gbps,
                          "iteration_floor_ms": round(floor_ms, 3)}),
              flush=True)
    else:
        print(f"chip: {chip.name} (HBM spec {chip.hbm_gbps} GB/s, "
              f"measured achievable {meas:.0f} GB/s, per-iteration "
              f"dispatch floor {floor_ms:.2f} ms)", flush=True)
        print(f"{'impl':>10} {'n':>6} {'ms':>8} {'GFLOP/s':>9} {'GB/s':>8} "
              f"{'SoL/spec':>9} {'SoL/meas':>9} {'marginal':>9}", flush=True)
    for impl in args.impls.split(","):
        for n in map(int, args.sizes.split(",")):
            dt, gflops, gbps = bench_fft(impl, args.batch, n,
                                         complex_in=not args.rfft)
            # marginal = kernel-only: the same row with the measured
            # fixed per-iteration dispatch cost removed
            dt_m = max(dt - floor_ms * 1e-3, 1e-9)
            gbps_m = gbps * dt / dt_m
            r = dict(impl=impl, n=n, batch=args.batch,
                     ms=round(dt * 1e3, 3), gflops=round(gflops, 1),
                     hbm_gbps=round(gbps, 1),
                     roofline_frac=round(gbps / chip.hbm_gbps, 3),
                     measured_frac=round(gbps / meas, 3),
                     marginal_gbps=round(gbps_m, 1),
                     # corrected numerator over corrected denominator
                     marginal_frac=round(gbps_m / meas_m, 3))
            if args.json:
                print(json.dumps(r), flush=True)
            else:
                print(f"{r['impl']:>10} {r['n']:>6} {r['ms']:>8} "
                      f"{r['gflops']:>9} {r['hbm_gbps']:>8} "
                      f"{100*r['roofline_frac']:>8.1f}% "
                      f"{100*r['measured_frac']:>8.1f}% "
                      f"{100*r['marginal_frac']:>8.1f}%", flush=True)


if __name__ == "__main__":
    main()
