#!/usr/bin/env python
"""On-hardware GEOMETRY sweep: the fused kernels COMPILED for the TPU
across a matrix of (nfft, hop, taps, block) shapes, each vs the float64
oracle (>= 60 dB, BASELINE.json:5).

tpu_selfcheck.py validates every kernel at ONE geometry; Mosaic-compiled
behavior is geometry-dependent (docs/KERNELS.md §1 constraint classes:
8-unaligned sublane slices, DMA row alignment, VMEM ceilings), so this
tool walks the kernels across the shapes the pipeline can reach —
including the repaired 8-unaligned overlap-save emissions and the
smallest streaming blocks (block == hop).  Each row prints as one JSON
line as it completes (first compiles are slow through the relay; a
buffered report would lose everything on timeout).

Run: python tools/tpu_geomsweep.py [--quick]
Exit nonzero if any geometry fails its bound or crashes.
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json
import traceback

import numpy as np


def run_case(tag, fn, results):
    try:
        snr = fn()
        rec = {"case": tag, "snr_db": round(float(snr), 1),
               "pass": bool(snr >= 60.0)}
    except Exception as e:  # a crash IS a finding — report and continue
        rec = {"case": tag, "error": f"{type(e).__name__}: {e}"[:300],
               "pass": False}
        traceback.print_exc(file=sys.stderr)
    results.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="smallest representative subset")
    args = p.parse_args()

    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
    from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused
    from audiosignalprocess_tpu.pipeline import Chain, GateStage

    rng = np.random.default_rng(5)
    results = []
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    # --- overlap-save: repaired 8-unaligned emission geometries (br=1/2
    # at padr 1/2/3), large taps, large nfft
    os_cases = [(64, 256), (193, 512), (385, 512), (897, 1024)]
    if not args.quick:
        os_cases += [(512, 2048), (4096, 16384)]
    for taps, nfft in os_cases:
        def case(taps=taps, nfft=nfft):
            x = rng.standard_normal((2, 4 * nfft)).astype(np.float32)
            # random taps: parity is the point, not filter shape
            h = 0.1 * rng.standard_normal(taps)
            ref = np.stack([oracle.fir_direct(x[i].astype(np.float64), h)
                            for i in range(2)])
            out = np.asarray(jax.jit(
                lambda v: overlap_save_fused(v, h, nfft))(x))
            return oracle.snr_db(ref, out)
        run_case(f"os taps={taps} nfft={nfft}", case, results)

    # --- whole-file fused gate across (nfft, hop)
    gate_cases = [(256, 128), (512, 128), (1024, 256)]
    if not args.quick:
        gate_cases += [(1024, 512), (2048, 512)]
    for nfft, hop in gate_cases:
        def case(nfft=nfft, hop=hop):
            n = nfft + 40 * hop
            x = (0.01 * rng.standard_normal((2, n))).astype(np.float32)
            x[:, n // 4: n // 2] += np.sin(
                2 * np.pi * 0.02 * np.arange(n // 2 - n // 4)
            ).astype(np.float32)
            ref = oracle.noise_gate(x.astype(np.float64), nfft, hop,
                                    noise_frames=4)
            out = np.asarray(jax.jit(lambda v: noise_gate_fused(
                v, nfft, hop, noise_frames=4))(x))
            m = min(ref.shape[-1], out.shape[-1])
            return oracle.snr_db(ref[..., :m], out[..., :m])
        run_case(f"gate nfft={nfft} hop={hop}", case, results)

    # --- streaming fused gate step at the smallest legal block (m=1)
    # and a mid block, vs the whole-file fused gate
    step_cases = [(1024, 256, 256), (1024, 256, 1024), (512, 128, 128)]
    for nfft, hop, block in step_cases:
        def case(nfft=nfft, hop=hop, block=block):
            chain = Chain([GateStage(nfft=nfft, hop=hop, noise_frames=4,
                                     fused=True)])
            chain.build()
            n = 16 * 1024
            x = (0.01 * rng.standard_normal((2, n))).astype(np.float32)
            x[:, 4000:9000] += np.sin(
                2 * np.pi * 440 * np.arange(5000) / 48000).astype(np.float32)
            y = np.asarray(jax.jit(
                lambda v: chain.stream(v, block))(x))
            full = np.asarray(jax.jit(chain.full)(x))
            lat = chain.latency
            return oracle.snr_db(
                full[..., : y.shape[-1] - lat].astype(np.float64) + 1e-30,
                y[..., lat:].astype(np.float64) + 1e-30)
        run_case(f"gate_step nfft={nfft} hop={hop} block={block}", case,
                 results)

    # --- polyphase resampler across ratios (incl. non-coprime and ragged n)
    from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac

    res_cases = [(160, 147), (3, 16)]
    if not args.quick:
        res_cases += [(17, 6)]
    for up, down in res_cases:
        def case(up=up, down=down):
            n = 40 * down + down // 2  # ragged final polyphase cycle
            x = rng.standard_normal((2, n)).astype(np.float32)
            ref = np.stack([oracle.resample_poly(
                x[i].astype(np.float64), up, down, zero_phase=False)
                for i in range(2)])
            out = np.asarray(jax.jit(lambda v: resample_mac(
                v, up, down, zero_phase=False))(x))
            return oracle.snr_db(ref, out)
        run_case(f"resample {up}/{down}", case, results)

    # --- the flagship composite step (resample+FIR+gate, ONE kernel per
    # block) at a second geometry beside selfcheck's default: its bf16x3
    # margin is the thinnest in the framework (docs/ROADMAP.md) and must
    # be tracked where it moves with shape
    from audiosignalprocess_tpu.pipeline import ResFIRGateStage

    # nfft=2048 runs the grid at n2=64 (the sub-128-lane row space the
    # whole-file gate case also exercises)
    comp_cases = [(1024, 256, 8 * 588), (512, 128, 4 * 588)]
    if not args.quick:
        comp_cases += [(2048, 512, 4 * 588)]
    for nfft, hop, block in comp_cases:
        def case(nfft=nfft, hop=hop, block=block):
            h = oracle.design_fir(64, 0.3)
            chain = Chain([ResFIRGateStage(
                up=160, down=147, h=h, nfft=nfft, hop=hop, noise_frames=4)])
            chain.build()
            n = (147 * 640 // block) * block
            x = (0.01 * rng.standard_normal((2, n))).astype(np.float32)
            x[:, n // 4: n // 2] += np.sin(
                2 * np.pi * 440 * np.arange(n // 2 - n // 4) / 44100
            ).astype(np.float32)
            st = chain.init_state((2,), block, np.float32)
            fused_step = isinstance(st[0], dict) and "res_hist" in st[0]
            y = np.asarray(jax.jit(lambda v: chain.stream(v, block))(x))
            ref = np.stack([oracle.noise_gate(
                oracle.fir_direct(
                    oracle.resample_poly(x[i].astype(np.float64), 160, 147,
                                         zero_phase=False), h),
                nfft, hop, noise_frames=4) for i in range(2)])
            lat = chain.latency
            m = min(ref.shape[-1] - 0, y.shape[-1] - lat)
            snr = oracle.snr_db(ref[..., :m] + 1e-30,
                                y[..., lat:lat + m].astype(np.float64) + 1e-30)
            if not fused_step:
                print(json.dumps({"note": f"composite {nfft}/{hop} fell "
                                  "back to the jnp step"}), flush=True)
            return snr
        run_case(f"res_fir_gate_step nfft={nfft} hop={hop} block={block}",
                 case, results)

    # --- streaming phase-vocoder step across (nfft, hop, p/q), drained:
    # the one kernel family whose numerics are chaotic under rounding
    # (docs/PERF.md), so the selfcheck's single 1024/256 point is not
    # enough.  Methodology matches tpu_selfcheck's stretch entry: both
    # sides pinned to HIGHEST (the rotor recursion amplifies any matmul
    # precision delta into decorrelation, which would measure precision,
    # not geometry), fused kernel vs the jnp streaming step.
    from audiosignalprocess_tpu.pipeline import StretchStage

    # block: frames m = block/hop needs m*q % p == 0 (StretchStage rate
    # mapping), so block is chosen per case
    stretch_cases = [(1024, 256, 4, 3, 2048), (512, 128, 3, 2, 1536)]
    if not args.quick:
        stretch_cases += [(2048, 512, 5, 4, 2560)]
    prev_mode = os.environ.get("ASP_MATMUL_MODE")
    os.environ["ASP_MATMUL_MODE"] = "highest"
    try:
        for nfft, hop, pp, qq, block in stretch_cases:
            def case(nfft=nfft, hop=hop, pp=pp, qq=qq, block=block):
                x = rng.standard_normal((2, block * 6)).astype(np.float32)
                cref = Chain([StretchStage(p=pp, q=qq, nfft=nfft, hop=hop)])
                cfus = Chain([StretchStage(p=pp, q=qq, nfft=nfft, hop=hop,
                                           fused=True)])
                cref.build(); cfus.build()
                yr = np.asarray(jax.jit(
                    lambda v: cref.stream(v, block, drain=True))(x))
                yf = np.asarray(jax.jit(
                    lambda v: cfus.stream(v, block, drain=True))(x))
                m = min(yr.shape[-1], yf.shape[-1])
                return oracle.snr_db(yr[..., :m].astype(np.float64) + 1e-30,
                                     yf[..., :m].astype(np.float64) + 1e-30)
            run_case(f"stretch_step nfft={nfft} hop={hop} pq={pp}/{qq}",
                     case, results)
    finally:
        if prev_mode is None:
            os.environ.pop("ASP_MATMUL_MODE", None)
        else:
            os.environ["ASP_MATMUL_MODE"] = prev_mode

    # --- the whole-file fused FIR->gate CHAIN kernel (the headline
    # kernel, round 5) across (taps, nfft, hop).  Placed LAST so the
    # shared rng stream feeding every earlier case keeps its
    # historical draw order — inserting mid-sweep was measured to
    # shift the composite case's data and swing its decision-flip
    # SNR by 20 dB (the known input sensitivity, not a regression) incl. a taps>hop geometry and a
    # non-default nfft; exercises the gpre/gpost split tables at every
    # shape
    from audiosignalprocess_tpu.kernels.chain_kernel import (
        fir_noise_gate_fused,
    )

    chain_cases = [(64, 1024, 256), (129, 1024, 512)]
    if not args.quick:
        chain_cases += [(385, 2048, 512)]
    for taps, nfft, hop in chain_cases:
        def case(taps=taps, nfft=nfft, hop=hop):
            n = nfft + 40 * hop
            x = (0.01 * rng.standard_normal((2, n))).astype(np.float32)
            x[:, n // 4: n // 2] += np.sin(
                2 * np.pi * 0.02 * np.arange(n // 2 - n // 4)
            ).astype(np.float32)
            hh = oracle.design_fir(taps, 0.3)
            ref = np.stack([
                oracle.noise_gate(oracle.fir_direct(
                    x[i].astype(np.float64), hh), nfft, hop, noise_frames=4)
                for i in range(2)
            ])
            out = np.asarray(jax.jit(lambda v: fir_noise_gate_fused(
                v, hh, nfft, hop, noise_frames=4))(x))
            m = min(ref.shape[-1], out.shape[-1])
            return oracle.snr_db(ref[..., :m], out[..., :m])
        run_case(f"chain taps={taps} nfft={nfft} hop={hop}", case, results)

    ok = all(r.get("pass") for r in results)
    print(json.dumps({"cases": len(results), "all_pass": ok}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
