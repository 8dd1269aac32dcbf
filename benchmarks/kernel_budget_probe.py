#!/usr/bin/env python
"""Stockham-kernel time-budget decomposition probes (round 4).

The roofline gate compares the FFT kernel's achieved GB/s against the
chip's measured ELEMENTWISE streaming bandwidth.  Round 4 found the
kernel's absolute rate invariant to chip-share slot, DMA tile rows
(ASP_SK_ROWS) and stage radix (ASP_SK_RADIX) while the elementwise
denominator swung 178-229 GB/s with co-tenant load — so the gate ratio
is not a stable property of the kernel.  These probes split the
kernel's time into its components on the SAME tile geometry:

  copy        — pure DMA in + out (no compute): Mosaic's scheduling of
                a body with nothing to overlap (measured pathological:
                48 GB/s — slower than the full FFT kernel)
  transpose2x — DMA + the kernel's two in-VMEM (L, n) <-> (n, L)
                transposes + a scale: the full memory machinery
                (measured 224.8 GB/s = ~98 %% of that slot's
                elementwise achievable)
  fma_chain   — flop-dense VPU probe: the chip share's achievable f32
                VPU rate (measured 1.21 Tflop/s = ~31 %% of the ~3.9
                Tflop/s v5e VPU estimate)
  full        — the real pallas_sk kernel for reference

Interpretation (docs/PERF.md "roofline, round 4"): the 5 n log2 n
butterfly flops (~8.05e9 at n=4096, batch 32768) need ~6.7 ms at the
SHARED VPU rate, only partly hidden under the 9.5 ms DMA+transpose
floor — hence ~12.6 ms total.  At the UNSHARED VPU rate they take
~2 ms and hide completely, leaving the kernel DMA-bound at ~97 %% of
achievable.  The residual roofline gap is the time-share, not kernel
design.

Run: python benchmarks/kernel_budget_probe.py [--batch 32768] [--n 4096]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FMA_REPEAT = 64


def _copy_kernel(xr_ref, xi_ref, or_ref, oi_ref):
    or_ref[:] = xr_ref[:]
    oi_ref[:] = xi_ref[:]


def _transpose_kernel(xr_ref, xi_ref, or_ref, oi_ref):
    xr = jnp.swapaxes(xr_ref[:], 0, 1)
    xi = jnp.swapaxes(xi_ref[:], 0, 1)
    or_ref[:] = jnp.swapaxes(xr * 1.0000001, 0, 1)
    oi_ref[:] = jnp.swapaxes(xi * 1.0000001, 0, 1)


def _fma_kernel(x_ref, o_ref):
    x = x_ref[:]
    acc = x
    for _ in range(FMA_REPEAT):
        acc = acc * 1.0000001 + x  # 2 flops/element
    o_ref[:] = acc


def _time_loop(loop, args, iters):
    float(loop(*args))  # compile + warm (scalar fetch = full sync)
    args2 = tuple(a * 1.0001 for a in args)
    t0 = time.perf_counter()
    float(loop(*args2))
    return (time.perf_counter() - t0) / iters


def run_two_plane(kern, b, n, iters=20):
    L = 128
    bs = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(kern, grid=(b // L,), in_specs=[bs, bs],
                       out_specs=(bs, bs),
                       out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),
                                  jax.ShapeDtypeStruct((b, n), jnp.float32)),
                       compiler_params=pltpu.CompilerParams(
                           vmem_limit_bytes=100 * 1024 * 1024))

    @jax.jit
    def loop(vr, vi):
        def body(_, c):
            cr, ci = c
            yr, yi = f(cr, ci)
            return cr + 1e-12 * yr, ci + 1e-12 * yi

        fr, fi = jax.lax.fori_loop(0, iters, body, (vr, vi))
        return jnp.sum(jnp.abs(fr[:, :64])) + jnp.sum(jnp.abs(fi[:, :64]))

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    return _time_loop(loop, (xr, xi), iters)


def run_fma(b, n, iters=20):
    L = 128
    bs = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(_fma_kernel, grid=(b // L,), in_specs=[bs],
                       out_specs=bs,
                       out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
                       compiler_params=pltpu.CompilerParams(
                           vmem_limit_bytes=100 * 1024 * 1024))

    @jax.jit
    def loop(v):
        def body(_, c):
            return c + 1e-12 * f(c)

        out = jax.lax.fori_loop(0, iters, body, v)
        return jnp.sum(jnp.abs(out[:, :64]))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n)).astype(np.float32))
    return _time_loop(loop, (x,), iters)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32768)
    p.add_argument("--n", type=int, default=4096)
    args = p.parse_args()
    b, n = args.batch, args.n
    byts = 2 * 2 * b * n * 4

    from benchmarks.roofline import bench_fft, measure_achievable_gbps

    meas, _ = measure_achievable_gbps(floor_ms=0.0)
    print(json.dumps({"achievable_gbps": round(meas, 1)}), flush=True)
    for name, kern in (("copy", _copy_kernel),
                       ("transpose2x", _transpose_kernel)):
        ms = run_two_plane(kern, b, n)
        print(json.dumps({"kernel": name, "ms": round(ms * 1e3, 3),
                          "gbps": round(byts / ms / 1e9, 1)}), flush=True)
    ms = run_fma(b, n)
    tflops = 2.0 * FMA_REPEAT * b * n / ms / 1e12
    print(json.dumps({"kernel": "fma_chain", "ms": round(ms * 1e3, 3),
                      "achieved_tflops_f32": round(tflops, 3)}), flush=True)
    dt, _, gbps = bench_fft("pallas_sk", b, n)
    print(json.dumps({"kernel": "full_pallas_sk", "ms": round(dt * 1e3, 3),
                      "gbps": round(gbps, 1),
                      "raw_frac": round(gbps / meas, 3)}), flush=True)


if __name__ == "__main__":
    main()
