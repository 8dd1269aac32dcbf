#!/usr/bin/env python
"""On-hardware kernel self-check: every Pallas kernel COMPILED for the
TPU (not interpret mode) vs the float64 oracle, >= 60 dB (BASELINE.json:5).

Run on a chip: python tools/tpu_selfcheck.py
(Complex arrays are kept planar throughout — some TPU transports do not
implement complex host<->device transfers.)

Every DECISION-BEARING kernel (gate threshold comparisons) is measured
on TWO data regimes (VERDICT r4 item 6: the round-4 pin A/B measured
26 dB of input-dependent spread from identical code): regime A is the
historical selfcheck data (seed 0, tones at fixed positions — rng draw
order preserved across rounds so the rows stay comparable), regime B is
the geomsweep-class data (seed 5, quiet noise + a mid-file burst),
recorded as "<kernel>__seedB".  Both regimes run the SAME measurement
code (_decision_rows) so the methodologies cannot silently diverge.
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import json

import numpy as np


def _decision_rows(results, suffix, h, he, b_in, xg, x_comp, x_step,
                   x_stream):
    """The seven decision-bearing kernel rows on one data regime.

    xg: (4, 48128) whole-file gate input; x_comp: (2, 147*160*2)
    whole-file composite input (44.1 kHz); x_step: (2, 8192) streaming
    gate/FIR+gate input; x_stream: (2, b_in*5) streaming composite
    input (44.1 kHz)."""
    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.kernels.chain_kernel import (
        fir_noise_gate_fused,
    )
    from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
    from audiosignalprocess_tpu.kernels.res_chain_kernel import (
        resample_fir_gate_fused,
    )
    from audiosignalprocess_tpu.pipeline import (
        Chain, FIRGateStage, GateStage, ResFIRGateStage,
    )

    og = np.asarray(jax.jit(lambda v: noise_gate_fused(v))(xg))
    rg = np.stack([oracle.noise_gate(xg[i].astype(np.float64))
                   for i in range(4)])
    results["noise_gate_fused" + suffix] = round(
        oracle.snr_db(rg, og[:, : rg.shape[-1]]), 1)

    oc2 = np.asarray(jax.jit(lambda v: fir_noise_gate_fused(v, h))(xg))
    rc2 = np.stack([
        oracle.noise_gate(oracle.fir_direct(xg[i].astype(np.float64), h))
        for i in range(4)
    ])
    results["fir_noise_gate_fused" + suffix] = round(
        oracle.snr_db(rc2, oc2), 1)

    o5 = np.asarray(jax.jit(
        lambda v: resample_fir_gate_fused(v, 160, 147, h,
                                          noise_frames=4))(x_comp))
    r5 = np.stack([
        oracle.noise_gate(oracle.fir_direct(
            oracle.resample_poly(x_comp[i].astype(np.float64), 160, 147,
                                 zero_phase=False), h), noise_frames=4)
        for i in range(2)
    ])
    results["resample_fir_gate_fused" + suffix] = round(
        oracle.snr_db(r5, o5), 1)

    # fused streaming gate step (pipeline.GateStage fused carry path):
    # stream 8 blocks through the kernel, compare vs the float64 oracle
    # whole-file gate over the latency-aligned overlap
    chain = Chain([GateStage(noise_frames=4, fused=True)])
    lat = chain.build()
    yst = np.asarray(jax.jit(lambda v: chain.stream(v, 1024))(x_step))[:, lat:]
    rst = np.stack([oracle.noise_gate(x_step[i].astype(np.float64),
                                      noise_frames=4) for i in range(2)])
    nst = min(yst.shape[-1], rst.shape[-1])
    results["gate_step_fused" + suffix] = round(
        oracle.snr_db(rst[:, :nst], yst[:, :nst]), 1)

    # one-kernel streaming FIR+gate step (pipeline.FIRGateStage)
    fg = Chain([FIRGateStage(h=h, nfft=1024, hop=256, noise_frames=4)])
    latf = fg.build()
    yfg = np.asarray(jax.jit(lambda v: fg.stream(v, 1024))(x_step))[:, latf:]
    rfg = np.stack([
        oracle.noise_gate(oracle.fir_direct(x_step[i].astype(np.float64), h),
                          noise_frames=4) for i in range(2)
    ])
    nfg = min(yfg.shape[-1], rfg.shape[-1])
    results["fir_gate_step_fused" + suffix] = round(
        oracle.snr_db(rfg[:, :nfg], yfg[:, :nfg]), 1)

    # one-kernel streaming resample+FIR+gate step (pipeline.ResFIRGateStage)
    rc_ = Chain([ResFIRGateStage(up=160, down=147, h=h, nfft=1024, hop=256,
                                 noise_frames=4)])
    latr = rc_.build()
    yr5 = np.asarray(jax.jit(
        lambda v: rc_.stream(v, b_in))(x_stream))[:, latr:]
    rr5 = np.stack([
        oracle.noise_gate(
            oracle.fir_direct(
                oracle.resample_poly(x_stream[i].astype(np.float64), 160,
                                     147, zero_phase=False), h),
            noise_frames=4) for i in range(2)
    ])
    nr5 = min(yr5.shape[-1], rr5.shape[-1])
    results["res_fir_gate_step_fused" + suffix] = round(
        oracle.snr_db(rr5[:, :nr5], yr5[:, :nr5]), 1)

    # the ENTIRE config-5 chain as one kernel per block (env_h folded:
    # resample + FIR + gate + envelope demod) vs the f64 oracle chain
    rce = Chain([ResFIRGateStage(up=160, down=147, h=h, nfft=1024, hop=256,
                                 noise_frames=4, env_h=he)])
    latre = rce.build()
    yre = np.asarray(jax.jit(
        lambda v: rce.stream(v, b_in))(x_stream))[:, latre:]
    rre = np.stack([
        oracle.fir_direct(np.abs(rr5[i]), he) * (np.pi / 2.0)
        for i in range(2)
    ])
    nre = min(yre.shape[-1], rre.shape[-1])
    results["res_fir_gate_env_step_fused" + suffix] = round(
        oracle.snr_db(rre[:, :nre], yre[:, :nre]), 1)


def main():
    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.kernels.fft_kernel import fft_fourstep
    from audiosignalprocess_tpu.kernels.fir_kernel import fir_mac
    from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused
    from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac

    rng = np.random.default_rng(0)
    h = oracle.design_fir(64, 0.3)
    he = oracle.design_fir(129, 0.05)
    results = {"backend": jax.default_backend()}

    xr_ = rng.standard_normal((16, 1024)).astype(np.float32)
    xi_ = rng.standard_normal((16, 1024)).astype(np.float32)
    yr, yi = jax.jit(lambda a, b: fft_fourstep(a, b, -1.0))(xr_, xi_)
    oc = np.asarray(yr) + 1j * np.asarray(yi)
    rc = np.fft.fft(xr_.astype(np.float64) + 1j * xi_.astype(np.float64))
    err = np.abs(rc - oc)
    results["fft_fourstep"] = round(
        10 * np.log10(np.sum(np.abs(rc) ** 2) / np.sum(err**2)), 1)

    from audiosignalprocess_tpu.kernels.fft_kernel import fft_radix2_lanes

    br, bi = jax.jit(lambda a, b: fft_radix2_lanes(a, b, -1.0))(xr_, xi_)
    bc = np.asarray(br) + 1j * np.asarray(bi)
    errb = np.abs(rc - bc)
    results["fft_radix2_lanes"] = round(
        10 * np.log10(np.sum(np.abs(rc) ** 2) / np.sum(errb**2)), 1)

    x = rng.standard_normal((4, 48000)).astype(np.float32)
    out = np.asarray(jax.jit(lambda v: overlap_save_fused(v, h, 1024))(x))
    ref = np.stack([oracle.fir_direct(x[i].astype(np.float64), h) for i in range(4)])
    results["overlap_save_fused"] = round(oracle.snr_db(ref, out), 1)

    # regime-A gate input (the historical selfcheck tone layout; the rng
    # DRAW ORDER here is frozen — rows are diffed across rounds)
    xg = 0.01 * rng.standard_normal((4, 48128)).astype(np.float32)
    xg[:, 16000:32000] += np.sin(
        2 * np.pi * 440 * np.arange(16000) / 48000).astype(np.float32)

    xs = rng.standard_normal((2, 14700)).astype(np.float32)
    orr = np.asarray(jax.jit(lambda v: resample_mac(v, 160, 147))(xs))
    rr = np.stack([
        oracle.resample_poly(xs[i].astype(np.float64), 160, 147) for i in range(2)
    ])
    results["resample_mac"] = round(oracle.snr_db(rr, orr), 1)

    xf = rng.standard_normal((2, 8000)).astype(np.float32)
    off = np.asarray(jax.jit(lambda v: fir_mac(v, h))(xf))
    rf = np.stack([oracle.fir_direct(xf[i].astype(np.float64), h) for i in range(2)])
    results["fir_mac"] = round(oracle.snr_db(rf, off), 1)

    from audiosignalprocess_tpu.kernels.fft_kernel import fft_stockham_lanes

    sr_, si_ = jax.jit(lambda a, b: fft_stockham_lanes(a, b, -1.0))(xr_, xi_)
    sc = np.asarray(sr_) + 1j * np.asarray(si_)
    errs = np.abs(rc - sc)
    results["fft_stockham_lanes"] = round(
        10 * np.log10(np.sum(np.abs(rc) ** 2) / np.sum(errs**2)), 1)

    # rolled constant-geometry kernel (impl="pallas_cg"): on-hardware
    # parity for the round-3 addition (compile/throughput A/B is
    # tools/tpu_pease_ab.py -> docs/KERNELS.md)
    from audiosignalprocess_tpu.kernels.fft_kernel import fft_pease_lanes

    pr_, pi_ = jax.jit(lambda a, b: fft_pease_lanes(a, b, -1.0))(xr_, xi_)
    pc = np.asarray(pr_) + 1j * np.asarray(pi_)
    errp = np.abs(rc - pc)
    results["fft_pease_lanes"] = round(
        10 * np.log10(np.sum(np.abs(rc) ** 2) / np.sum(errp**2)), 1)

    from audiosignalprocess_tpu.kernels.fft_kernel import (
        irfft_stockham, rfft_stockham,
    )

    rr_, ri_ = jax.jit(rfft_stockham)(xr_)
    rgot = np.asarray(rr_) + 1j * np.asarray(ri_)
    rref = np.fft.rfft(xr_.astype(np.float64))
    errr = np.abs(rref - rgot)
    results["rfft_stockham"] = round(
        10 * np.log10(np.sum(np.abs(rref) ** 2) / np.sum(errr**2)), 1)
    back = np.asarray(jax.jit(
        lambda a, b: irfft_stockham(a, b, 1024))(rr_, ri_))
    results["irfft_stockham"] = round(
        oracle.snr_db(xr_.astype(np.float64), back), 1)

    # the auto real-transform route (pallas_sk_split: XLA pack/untangle
    # around the Stockham complex kernel — the measured default on this
    # chip).  Planar in/out so nothing complex crosses the transport.
    import jax.numpy as jnp

    from audiosignalprocess_tpu.ops import fft as fft_ops

    sr_, si_ = jax.jit(lambda v: (lambda s: (jnp.real(s), jnp.imag(s)))(
        fft_ops.rfft(v, impl="pallas_sk_split")))(xr_)
    sgot = np.asarray(sr_) + 1j * np.asarray(si_)
    errs = np.abs(rref - sgot)
    results["rfft_sk_split"] = round(
        10 * np.log10(np.sum(np.abs(rref) ** 2) / np.sum(errs**2)), 1)
    backs = np.asarray(jax.jit(lambda a, b: fft_ops.irfft(
        a + 1j * b, 1024, impl="pallas_sk_split"))(sr_, si_))
    results["irfft_sk_split"] = round(
        oracle.snr_db(xr_.astype(np.float64), backs), 1)

    # remaining regime-A decision inputs (draw order frozen, see above)
    x_comp = 0.01 * rng.standard_normal((2, 147 * 160 * 2)).astype(np.float32)
    x_comp[:, 8000:30000] += np.sin(
        2 * np.pi * 440 * np.arange(22000) / 44100).astype(np.float32)
    x_step = 0.01 * rng.standard_normal((2, 8192)).astype(np.float32)
    x_step[:, 2048:6000] += np.sin(
        2 * np.pi * 440 * np.arange(3952) / 48000).astype(np.float32)
    b_in = 4 * 588  # 4 supercycles of 160/147 @ n2=128
    x_stream = 0.01 * rng.standard_normal((2, b_in * 5)).astype(np.float32)
    x_stream[:, 3000:9000] += np.sin(
        2 * np.pi * 440 * np.arange(6000) / 44100).astype(np.float32)

    _decision_rows(results, "", h, he, b_in, xg, x_comp, x_step, x_stream)

    # fused streaming phase-vocoder step (pipeline.StretchStage fused
    # path) vs the jnp streaming step on the same blocks.  The rotor
    # phase accumulator is chaotic under rounding, so the check pins
    # BOTH sides to the same matmul precision: the jnp path is always
    # HIGHEST, and the kernel's default bf16x3 (~109 dB/matmul) is
    # enough for every non-recursive kernel above but diverges to
    # ~51 dB through the rotor recursion — measured 84 dB when matched.
    # (Implementation correctness at equal precision is pinned by
    # tests/unit/test_pipeline.py::TestStretchStage on every CI run.)
    from audiosignalprocess_tpu.pipeline import Chain, StretchStage

    prev_mode = os.environ.get("ASP_MATMUL_MODE")
    os.environ["ASP_MATMUL_MODE"] = "highest"
    try:
        xpv = rng.standard_normal((2, 2048 * 6)).astype(np.float32)
        sref = Chain([StretchStage(p=4, q=3, nfft=1024, hop=256)])
        sfus = Chain([StretchStage(p=4, q=3, nfft=1024, hop=256,
                                   fused=True)])
        sref.build(); sfus.build()
        ypr = np.asarray(jax.jit(lambda v: sref.stream(v, 2048))(xpv))
        ypf = np.asarray(jax.jit(lambda v: sfus.stream(v, 2048))(xpv))
        results["stretch_step_fused"] = round(
            oracle.snr_db(ypr.astype(np.float64) + 1e-30,
                          ypf.astype(np.float64) + 1e-30), 1)
    finally:
        if prev_mode is None:
            os.environ.pop("ASP_MATMUL_MODE", None)
        else:
            os.environ["ASP_MATMUL_MODE"] = prev_mode

    # ---- second data regime: the geomsweep-class layout (seed 5)
    rngb = np.random.default_rng(5)

    def burst(channels, n, amp=0.01, f=440.0, fs=48000):
        xb = (amp * rngb.standard_normal((channels, n))).astype(np.float32)
        lo, hi = n // 4, n // 2
        xb[:, lo:hi] += np.sin(
            2 * np.pi * f * np.arange(hi - lo) / fs).astype(np.float32)
        return xb

    xgb = burst(4, 48128)
    x_comp_b = burst(2, 147 * 160 * 2, fs=44100)
    x_step_b = burst(2, 8192)
    x_stream_b = burst(2, b_in * 5, fs=44100)
    _decision_rows(results, "__seedB", h, he, b_in, xgb, x_comp_b,
                   x_step_b, x_stream_b)

    ok = all(v >= 60.0 for k, v in results.items() if k != "backend")
    results["all_pass_60db"] = ok
    print(json.dumps(results))
    sys.exit(0 if ok else 1)


def soak(p: int = 4, q: int = 3, nblocks: int = 128, json_out=None):
    """Long-stream vocoder soak at SHIPPING defaults (VERDICT r2 item 5;
    extended to arbitrary lengths for VERDICT r4 item 2): ``nblocks``
    drained blocks of stretch_step_fused at the kernel's default
    matmul precision (bf16x3 + the vfft analysis pin on hardware) vs
    the float64 oracle (oracle.time_stretch), with the HIGHEST-precision
    jnp stream as the control.  Reports 8 per-segment SNRs so
    accumulated rotor drift (the phase accumulator integrates analysis
    noise as a random walk — docs/PERF.md round-5 soak analysis) is
    visible, and gates on the fused stream's overall SNR >= 60 dB.
    Run: python tools/tpu_selfcheck.py --soak [P Q] [--blocks N]
    [--json-out PATH]
    (block must keep frames*q % p == 0: 2048/256-hop frames = 8/block,
    so p in {2, 4, 8} works at the default block; pass a ratio whose p
    divides 8*q)."""
    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.pipeline import Chain, StretchStage

    block = 2048
    n = block * nblocks
    rng = np.random.default_rng(11)
    t = np.arange(n) / 48000.0
    x = (0.3 * rng.standard_normal((2, n))
         + 0.5 * np.sin(2 * np.pi * 440.0 * t)
         * np.sin(2 * np.pi * 0.3 * t)).astype(np.float32)

    cf = Chain([StretchStage(p=p, q=q, nfft=1024, hop=256, fused=True)])
    cj = Chain([StretchStage(p=p, q=q, nfft=1024, hop=256)])
    cf.build()
    cj.build()
    yf = np.asarray(jax.jit(lambda v: cf.stream(v, block, drain=True))(x))
    yj = np.asarray(jax.jit(lambda v: cj.stream(v, block, drain=True))(x))
    ref = np.stack([
        oracle.time_stretch(x[i].astype(np.float64), p / q, 1024, 256)
        for i in range(2)
    ])
    # trim the tail ramp: the float-rate oracle's final frame count can
    # differ by one from the rational mapping's
    m = min(yf.shape[-1], ref.shape[-1]) - 2048
    results = {"backend": jax.default_backend(), "blocks": nblocks,
               "p_over_q": f"{p}/{q}"}
    seg = m // 8
    for name, y in (("fused_bf16x3", yf), ("jnp_highest", yj)):
        segs = [round(oracle.snr_db(ref[:, s * seg : (s + 1) * seg],
                                    y[:, s * seg : (s + 1) * seg]
                                    .astype(np.float64)), 1)
                for s in range(8)]
        results[name + "_segments_db"] = segs
        results[name + "_overall_db"] = round(
            oracle.snr_db(ref[:, :m], y[:, :m].astype(np.float64)), 1)
    ok = results["fused_bf16x3_overall_db"] >= 60.0
    results["pass_60db"] = bool(ok)
    print(json.dumps(results))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    sys.exit(0 if ok else 1)


def soak_composite(nblocks: int = 128, json_out=None):
    """Long-stream soak of the COMPOSITE config-5 chain (VERDICT r4 item
    8): ``nblocks`` drained blocks of the one-kernel-per-block
    resample+FIR+gate+envelope step (pipeline.ResFIRGateStage with
    env_h) at shipping precision vs the float64 oracle chain, on BOTH
    measured gate-flip data regimes (the selfcheck seed and the
    geomsweep-class seed — round 4 proved the flip mechanism is
    data-dependent).  Reports 8 per-segment SNRs per regime; unlike the
    vocoder there is no cross-block recursion here (carries are FIFO
    tails), so the expected signature is a FLAT segment profile — a
    slope would indicate an unknown accumulating carry error.
    Run: python tools/tpu_selfcheck.py --soak-composite [--blocks N]
    [--json-out PATH]"""
    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.pipeline import Chain, ResFIRGateStage

    b_in = 2 * 588  # one supercycle pair of 160/147 at n2=128
    n = b_in * nblocks
    h = oracle.design_fir(64, 0.3)
    he = oracle.design_fir(129, 0.05)
    results = {"backend": jax.default_backend(), "blocks": nblocks,
               "block_in": b_in}

    for tag, seed, burst in (("seedA", 11, (0.25, 0.5)),
                             ("seedB", 5, (0.25, 0.5))):
        rng = np.random.default_rng(seed)
        x = (0.01 * rng.standard_normal((2, n))).astype(np.float32)
        lo, hi = int(n * burst[0]), int(n * burst[1])
        x[:, lo:hi] += np.sin(
            2 * np.pi * 440 * np.arange(hi - lo) / 44100).astype(np.float32)
        chain = Chain([ResFIRGateStage(up=160, down=147, h=h, nfft=1024,
                                       hop=256, noise_frames=4, env_h=he)])
        chain.build()
        # drain=True emits exactly out_len(n) samples aligned from
        # sample 0 (latency already flushed) — no lat trim
        y = np.asarray(jax.jit(
            lambda v: chain.stream(v, b_in, drain=True))(x))
        base = np.stack([
            oracle.noise_gate(
                oracle.fir_direct(
                    oracle.resample_poly(x[i].astype(np.float64), 160, 147,
                                         zero_phase=False), h),
                noise_frames=4) for i in range(2)
        ])
        ref = np.stack([
            oracle.fir_direct(np.abs(base[i]), he) * (np.pi / 2.0)
            for i in range(2)
        ])
        m = min(y.shape[-1], ref.shape[-1])
        seg = m // 8
        segs = [round(oracle.snr_db(ref[:, s * seg:(s + 1) * seg],
                                    y[:, s * seg:(s + 1) * seg]
                                    .astype(np.float64)), 1)
                for s in range(8)]
        results[tag + "_segments_db"] = segs
        results[tag + "_overall_db"] = round(
            oracle.snr_db(ref[:, :m], y[:, :m].astype(np.float64)), 1)
        print(json.dumps({tag: results[tag + "_overall_db"],
                          "segments": segs}), flush=True)

    ok = all(results[t + "_overall_db"] >= 60.0 for t in ("seedA", "seedB"))
    results["pass_60db"] = bool(ok)
    print(json.dumps(results))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)
            f.write("\n")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if "--soak-composite" in sys.argv:
        blocks = 128
        if "--blocks" in sys.argv:
            blocks = int(sys.argv[sys.argv.index("--blocks") + 1])
        json_out = None
        if "--json-out" in sys.argv:
            json_out = sys.argv[sys.argv.index("--json-out") + 1]
        soak_composite(nblocks=blocks, json_out=json_out)
    elif "--soak" in sys.argv:
        blocks = 128
        if "--blocks" in sys.argv:
            blocks = int(sys.argv[sys.argv.index("--blocks") + 1])
        json_out = None
        if "--json-out" in sys.argv:
            json_out = sys.argv[sys.argv.index("--json-out") + 1]
        drop = set()
        for flag in ("--blocks", "--json-out"):
            if flag in sys.argv:
                k = sys.argv.index(flag)
                drop.update({k, k + 1})
        args = [a for i, a in enumerate(sys.argv) if i not in drop]
        rest = [a for a in args[args.index("--soak") + 1:]
                if not a.startswith("-")]
        if len(rest) >= 2:
            soak(int(rest[0]), int(rest[1]), nblocks=blocks,
                 json_out=json_out)
        else:
            soak(nblocks=blocks, json_out=json_out)
    else:
        main()
