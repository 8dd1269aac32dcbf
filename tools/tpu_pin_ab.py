#!/usr/bin/env python
"""On-hardware isolation A/B for the composite-step bf16x3 margin
(docs/ROADMAP.md "Performance"): which matmul family drives
res_fir_gate_step_fused to its round-3 77.6 dB — the resample supercycle
phase matrices ("res", contraction dim W5 ~ 600) or the four-step grid
FFT tables ("fft")?

For each ASP_MATMUL_PIN in (none, cfftpre, cfft, res, fft, res+fft):
  - streamed composite-step SNR vs the f64 oracle chain (the exact
    selfcheck geometry, so rows are comparable with selfcheck_rNN.json)
  - on-device res_step throughput (bench.py methodology: lax.fori_loop
    with a data dependency + scalar checksum fetch)

--throughput-ab REPS [--ab-mode MODE] runs only the interleaved
none/cfftpre/cfft cost A/B (slot-drift-cancelling; this is where the
shipped 11.4-12.9 %% cfftpre cost numbers come from).

The CPU interpret path does NOT reproduce the on-chip margin (measured
108.0 dB with ASP_MATMUL_MODE=bf16x3 forced on CPU, vs 77.6 on-chip,
round 4), so this A/B is only meaningful compiled on the chip.

Run: python tools/tpu_pin_ab.py [--skip-throughput]
"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import common as _common  # noqa: E402,F401  (ASP_FORCE_PLATFORM)

import argparse
import json

import numpy as np


def composite_snr(rng_seed=0):
    import jax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.pipeline import Chain, ResFIRGateStage

    rng = np.random.default_rng(rng_seed)
    h = oracle.design_fir(64, 0.3)
    b_in = 4 * 588
    x = 0.01 * rng.standard_normal((2, b_in * 5)).astype(np.float32)
    x[:, 3000:9000] += np.sin(
        2 * np.pi * 440 * np.arange(6000) / 44100).astype(np.float32)
    chain = Chain([ResFIRGateStage(up=160, down=147, h=h, nfft=1024,
                                   hop=256, noise_frames=4)])
    lat = chain.build()
    y = np.asarray(jax.jit(lambda v: chain.stream(v, b_in))(x))[:, lat:]
    ref = np.stack([
        oracle.noise_gate(
            oracle.fir_direct(
                oracle.resample_poly(x[i].astype(np.float64), 160, 147,
                                     zero_phase=False), h),
            noise_frames=4) for i in range(2)
    ])
    m = min(y.shape[-1], ref.shape[-1])
    return float(oracle.snr_db(ref[:, :m], y[:, :m]))


def throughput_ab(reps: int, mode: str = "res_step"):
    """Interleaved none/cfftpre/cfft throughput: alternating runs so
    slot drift on the time-shared chip cancels out of the cost ratios
    (the sequential sweep in main() is order-confounded)."""
    import bench

    pins = ("none", "cfftpre", "cfft")
    rows = {p: [] for p in pins}
    for rep in range(reps):
        for pin in pins:
            os.environ["ASP_MATMUL_PIN"] = pin
            sps, _ = bench.bench_fir_stft_chain(fused=mode)
            rows[pin].append(round(sps, 1))
            print(json.dumps({"rep": rep, "pin": pin, "mode": mode,
                              "samples_per_s": rows[pin][-1]}), flush=True)
    os.environ.pop("ASP_MATMUL_PIN", None)
    import statistics
    med = {p: statistics.median(rows[p]) for p in pins}
    print(json.dumps({"mode": mode,
                      **{f"median_{p}": med[p] for p in pins},
                      "cfftpre_cost_frac": round(1 - med["cfftpre"]
                                                 / med["none"], 3),
                      "cfft_cost_frac": round(1 - med["cfft"]
                                              / med["none"], 3)}),
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-throughput", action="store_true")
    p.add_argument("--ab-mode", default="res_step",
                   help="bench mode for --throughput-ab")
    p.add_argument("--throughput-ab", type=int, default=0, metavar="REPS",
                   help="interleaved none/cfftpre/cfft cost A/B only")
    args = p.parse_args()

    import jax

    import bench

    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    if args.throughput_ab:
        throughput_ab(args.throughput_ab, mode=args.ab_mode)
        sys.exit(0)
    rows = []
    for pin in ("none", "cfftpre", "cfft", "res", "fft", "res,fft"):
        os.environ["ASP_MATMUL_PIN"] = pin
        rec = {"pin": pin, "snr_db": round(composite_snr(), 1)}
        if not args.skip_throughput:
            sps, _ = bench.bench_fir_stft_chain(fused="res_step")
            rec["res_step_samples_per_s"] = round(sps, 1)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    os.environ.pop("ASP_MATMUL_PIN", None)
    base = rows[0]
    for r in rows[1:]:
        r2 = {"pin": r["pin"], "snr_gain_db": round(r["snr_db"] - base["snr_db"], 1)}
        if "res_step_samples_per_s" in r:
            r2["throughput_ratio"] = round(
                r["res_step_samples_per_s"] / base["res_step_samples_per_s"], 3)
        print(json.dumps(r2), flush=True)
    sys.exit(0)


if __name__ == "__main__":
    main()
