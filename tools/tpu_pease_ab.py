#!/usr/bin/env python
"""On-hardware A/B of the rolled constant-geometry FFT kernel
(``fft_pease_lanes``, ops.fft impl="pallas_cg") vs the unrolled Stockham
kernel (``fft_stockham_lanes``, impl="pallas_sk"):

1. FIRST-compile wall time (the rolled kernel's reason to exist: one
   fori_loop stage body compiles instead of log2(n) unrolled bodies).
   The persistent compilation cache is DISABLED in this process so the
   number is a true cold compile through the relay.
2. Throughput at the roofline operating points (n in {1024, 4096},
   batch 8192/32768), timed with the on-device fori_loop + scalar
   checksum methodology (naive timing is invalid on this transport —
   CLAUDE.md / docs/KERNELS.md "Benchmark methodology").
3. Parity dB vs the float64 numpy FFT on the same input.

Prints one JSON line per measurement as it completes (first compiles are
slow; a buffered report would lose everything on a timeout).  Results
land in docs/KERNELS.md "Constant-geometry rolled kernel (Pease)".

Run: python tools/tpu_pease_ab.py [--sizes 1024,4096] [--batches 8192,32768]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Cold-compile measurement (--mode compile) must not be served by the
# persistent cache.  This must happen BEFORE anything imports jax (the
# tools.common import below does, transitively): jax snapshots the env
# var at import, so a later pop is a no-op.
if "--mode" in sys.argv and \
        sys.argv[sys.argv.index("--mode") + 1:][:1] == ["compile"]:
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json
import time

import numpy as np


def measure(core_name, n, batch, iters, rng):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from audiosignalprocess_tpu.kernels import fft_kernel

    core = getattr(fft_kernel, core_name)
    xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    @jax.jit
    def loop(vr, vi):
        def body(_, carry):
            cr, ci = carry
            yr, yi = core(cr, ci, -1.0)
            # data dependency forces sequential iterations; the 1e-12
            # feedback is irrelevant to timing and to the checksum scale
            return cr + 1e-12 * yr, ci + 1e-12 * yi

        fr, fi = lax.fori_loop(0, iters, body, (vr, vi))
        return jnp.sum(jnp.abs(fr[:, :64])) + jnp.sum(jnp.abs(fi[:, :64]))

    # first call = trace + compile + run (scalar fetch forces completion)
    t0 = time.perf_counter()
    float(loop(xr, xi))
    compile_s = time.perf_counter() - t0

    # Timed input must (a) differ from the warm-up's — the relay dedupes
    # identical RPCs — and (b) be DERIVED ON-DEVICE, never a fresh host
    # array: this transport defers host->device uploads until first use,
    # so a jnp.asarray'd input lands its multi-100-MB transfer (~35 MB/s
    # large-message path) INSIDE the timed call.  That deferred upload is
    # what produced the 0.5-3 GB/s "contended slot" rows in rounds 4 and
    # 5's first attempts (pease_ab_r04.json and the superseded r05 run):
    # the bracketing slot probes were healthy — the rows were measuring
    # the transport, not the kernel.
    scale = jnp.float32(1.000001)
    xr2, xi2 = jax.jit(lambda a, b: (a * scale, b * scale))(xr, xi)
    float(jnp.sum(jnp.abs(xr2[:8, :64])))  # force materialization
    float(jnp.sum(jnp.abs(xi2[:8, :64])))
    t0 = time.perf_counter()
    float(loop(xr2, xi2))
    run_s = (time.perf_counter() - t0) / iters

    # parity on a small slice (f64 oracle)
    yr, yi = jax.jit(lambda a, b: core(a, b, -1.0))(xr[:64], xi[:64])
    got = np.asarray(yr) + 1j * np.asarray(yi)
    ref = np.fft.fft(np.asarray(xr[:64], np.float64)
                     + 1j * np.asarray(xi[:64], np.float64))
    snr = 10 * np.log10(np.sum(np.abs(ref) ** 2)
                        / max(np.sum(np.abs(ref - got) ** 2), 1e-300))

    byts = 2 * 2 * batch * n * 4  # planar complex in + out, f32
    return {
        "kernel": core_name, "n": n, "batch": batch,
        "first_call_s": round(compile_s, 1),
        "per_iter_ms": round(run_s * 1e3, 3),
        "gbytes_per_s": round(byts / run_s / 1e9, 1),
        "snr_db": round(float(snr), 1),
    }


def compile_probe(sizes):
    """Cold-vs-cold Mosaic compile-time A/B.

    The relay's SERVER-side executable cache survives a client-side
    cache disable (measured round 4: Stockham n=1024 'cold' compile
    2.8 s in a fresh process with the persistent cache off, vs the
    ~12 min true cold compile recorded in round 2 — the server still
    held round-3 executables), and the cache appears keyed by the
    Mosaic kernel BODY, not the full HLO (a new batch size at a known
    n also compiled in seconds).  So a genuine A/B must use FFT sizes
    whose kernel bodies were NEVER compiled on this server: pass such
    sizes via --sizes (n=2048/8192 in round 4).  The process warms the
    relay with a distinct trivial op first so one-time session setup
    (~minutes) does not land in the first row.
    """
    import time as _time

    import jax
    import jax.numpy as jnp

    from audiosignalprocess_tpu.kernels import fft_kernel

    rng = np.random.default_rng(3)
    # absorb relay session establishment + toolchain warm-up
    w = jnp.asarray(rng.standard_normal((256, 257)).astype(np.float32))
    t0 = _time.perf_counter()
    float(jnp.sum(jax.jit(lambda v: (v @ v.T))(w)[0]))
    warm_s = _time.perf_counter() - t0
    print(json.dumps({"relay_warmup_s": round(warm_s, 1)}), flush=True)

    batch = 1024  # small: run time negligible vs compile time
    for n in sizes:
        for core_name in ("fft_pease_lanes", "fft_stockham_lanes"):
            core = getattr(fft_kernel, core_name)
            xr = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
            xi = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))
            f = jax.jit(lambda a, b, c=core: c(a, b, -1.0))
            t0 = _time.perf_counter()
            yr, yi = f(xr, xi)
            sm = float(jnp.sum(jnp.abs(yr[:8])) + jnp.sum(jnp.abs(yi[:8])))
            dt = _time.perf_counter() - t0
            got = np.asarray(yr)[:16] + 1j * np.asarray(yi)[:16]
            ref = np.fft.fft(np.asarray(xr[:16], np.float64)
                             + 1j * np.asarray(xi[:16], np.float64))
            snr = 10 * np.log10(np.sum(np.abs(ref) ** 2)
                                / max(np.sum(np.abs(ref - got) ** 2), 1e-300))
            print(json.dumps({"kernel": core_name, "n": n,
                              "cold_compile_s": round(dt, 1),
                              "snr_db": round(float(snr), 1),
                              "checksum_finite": bool(np.isfinite(sm))}),
                  flush=True)


def slot_health(min_gbps: float) -> float:
    """Round-5 pre-check (VERDICT r4 item 4): the round-4 throughput
    rows were unusable because the run landed in a memory-contended
    slot (rows at 0.5-3 GB/s).  Measure the elementwise achievable
    bandwidth first and REFUSE to produce throughput rows when the slot
    is contaminated — the caller retries later instead of recording
    garbage."""
    from benchmarks.roofline import (
        measure_achievable_gbps, measure_iteration_floor_ms,
    )

    floor = measure_iteration_floor_ms()
    gbps, _ = measure_achievable_gbps(floor_ms=floor)
    print(json.dumps({"slot_probe_gbps": round(gbps, 1),
                      "health_min_gbps": min_gbps,
                      "healthy": bool(gbps >= min_gbps)}), flush=True)
    return gbps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1024,4096")
    p.add_argument("--batches", default="8192,32768")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--mode", choices=["throughput", "compile"],
                   default="throughput")
    p.add_argument("--health-min-gbps", type=float, default=50.0,
                   help="abort (exit 3) if the slot's elementwise probe "
                        "is below this — a contaminated slot must not "
                        "produce throughput rows")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    # ONLY the compile mode disables caching (the env pop happened at
    # module top, pre-jax-import — see the header comment).  Keeping
    # the cache ON in throughput mode matters: the r4/r5 garbage rows
    # were ultimately the transport's deferred host->device upload
    # landing in the timed call (see measure()), and a disabled cache
    # adds recompile noise on top.
    import jax

    if args.mode == "compile":
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except Exception as e:
            # a silently-served persistent cache is this tool's whole
            # failure class: surface the degradation instead of hiding it
            print(json.dumps({"warning": "could not disable the "
                              f"in-process compilation cache: {e!r} — "
                              "cold-compile rows may be warm"}),
                  flush=True)

    sizes = [int(s) for s in args.sizes.split(",")]
    print(json.dumps({"backend": jax.default_backend(), "mode": args.mode,
                      "compilation_cache": "disabled"}), flush=True)
    if args.mode == "compile":
        compile_probe(sizes)
        sys.exit(0)

    pre = slot_health(args.health_min_gbps)
    if pre < args.health_min_gbps:
        print(json.dumps({"aborted": "contaminated slot — retry later"}),
              flush=True)
        sys.exit(3)

    rng = np.random.default_rng(7)
    batches = [int(b) for b in args.batches.split(",")]
    rows = []
    for n in sizes:
        # interleave kernels per (n, batch) so slot drift on the
        # time-shared chip cancels out of the pease/stockham ratio
        for batch in batches:
            for core in ("fft_pease_lanes", "fft_stockham_lanes"):
                r = measure(core, n, batch, args.iters, rng)
                rows.append(r)
                print(json.dumps(r), flush=True)
    post = slot_health(args.health_min_gbps)
    ok = all(r["snr_db"] >= 60.0 for r in rows)
    out = {"slot_probe_pre_gbps": round(pre, 1),
           "slot_probe_post_gbps": round(post, 1),
           "slot_clean": bool(min(pre, post) >= args.health_min_gbps),
           "rows": rows, "all_pass_60db": ok}
    print(json.dumps({"all_pass_60db": ok,
                      "slot_clean": out["slot_clean"]}), flush=True)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
        print(f"wrote {args.json_out}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
