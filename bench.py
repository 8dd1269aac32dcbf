"""Benchmark driver: samples/s/chip on the 48 kHz FIR+STFT chain
(the primary metric, BASELINE.json:2).

Runs the flagship chain (64-tap FIR overlap-save + 1024/256 STFT noise
gate) on a multichannel 48 kHz signal on one chip, and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "samples/s/chip", "vs_baseline": N}

Timing methodology: the chain is iterated ON-DEVICE inside a single jit
(lax.fori_loop with a data dependency between iterations), so host/tunnel
round-trip latency and any RPC-level caching cannot distort the number;
wall time is divided by the iteration count.

The reference publishes no numbers (BASELINE.json:13 "published": {});
``vs_baseline`` is reported against the natural reference point for an
audio pipeline: single-channel real-time at 48 kHz (value / 48000 = how
many real-time 48 kHz channels one chip sustains through the chain).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# honor ASP_FORCE_PLATFORM (the TPU plugin ignores JAX_PLATFORMS; only
# jax.config works, and it must run before backend init — CLAUDE.md).
# Nothing that transitively imports the package (= jax-loading modules)
# may be imported above this block.
_plat = os.environ.get("ASP_FORCE_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

from audiosignalprocess_tpu.utils.validate import check  # noqa: E402


def bench_fir_stft_chain(
    channels: int = 64,
    seconds: float = 10.0,
    fs: int = 48000,
    iters: int = 20,
    dtype=np.float32,
    fused="chain",
):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.effects.noise_gate import noise_gate
    from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
    from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused
    from audiosignalprocess_tpu.ops.overlap_save import overlap_save

    n = int(seconds * fs)
    if str(fused).startswith("res"):
        # 44.1->48k front half: input sized so the resampled length is
        # row-aligned (n multiple of 147*4 -> out multiple of 640)
        fs = 44100
        n = (int(seconds * fs) // 588) * 588
    else:
        n = (n // 256) * 256  # hop-aligned
    h = oracle.design_fir(64, 0.3)

    if fused == "chain":  # ONE fully-fused Pallas kernel (speed of light)
        from audiosignalprocess_tpu.kernels.chain_kernel import fir_noise_gate_fused

        def chain(v):
            return fir_noise_gate_fused(v, h, 1024, 256, noise_frames=8)
    elif fused == "res_chain":
        # config-5 front half in ONE kernel: resample+FIR+gate fused
        from audiosignalprocess_tpu.kernels.res_chain_kernel import (
            resample_fir_gate_fused,
        )

        def chain(v):
            return resample_fir_gate_fused(v, 160, 147, h, noise_frames=8)
    elif fused == "res_two":
        # the same chain as two kernels (resample, then FIR+gate): the
        # comparison point for the fused win
        from audiosignalprocess_tpu.kernels.chain_kernel import fir_noise_gate_fused
        from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac

        def chain(v):
            y = resample_mac(v, 160, 147, zero_phase=False)
            return fir_noise_gate_fused(y, h, 1024, 256, noise_frames=8)
    elif fused in ("stream", "stream_jnp", "stream1", "res_step",
                   "res_env_step"):
        # the STREAMING path (BASELINE.json:11): lax.scan over per-block
        # Chain.step — "stream" runs the fused Pallas step kernels
        # (overlap_save_fused + gate_step_fused per block), "stream1" the
        # single-kernel FIR+gate step (fir_gate_step_fused), "res_step"
        # the single-kernel resample+FIR+gate step (ResFIRGateStage),
        # "res_env_step" the ENTIRE config-5 chain (resample+FIR+gate+
        # envelope demod) as ONE kernel per block (env_h folded in),
        # "stream_jnp" the jnp steps, so the deltas isolate the
        # streaming-kernel wins
        from audiosignalprocess_tpu.pipeline import (
            Chain, FIRGateStage, FIRStage, GateStage, ResFIRGateStage,
        )

        if fused in ("res_step", "res_env_step"):
            env = oracle.design_fir(129, 0.01) if fused == "res_env_step" \
                else None
            stages = [ResFIRGateStage(up=160, down=147, h=h, nfft=1024,
                                      hop=256, noise_frames=8, env_h=env)]
        elif fused == "stream1":
            stages = [FIRGateStage(h=h, nfft=1024, hop=256, noise_frames=8)]
        else:
            fs_flag = fused == "stream"
            stages = [
                FIRStage(h=h, nfft=1024, fused=fs_flag),
                GateStage(nfft=1024, hop=256, noise_frames=8, fused=fs_flag),
            ]
        chain_obj = Chain(stages)
        chain_obj.build()
        # res_step: 8 supercycles of 160/147 (b_out = 5120, hop-aligned)
        block = 8 * 588 if fused in ("res_step", "res_env_step") else 4096
        n = (n // block) * block

        def chain(v):
            return chain_obj.stream(v, block)
    elif fused is True:  # two fused Pallas kernels
        def chain(v):
            y = overlap_save_fused(v, h, 1024)
            return noise_gate_fused(y, 1024, 256, noise_frames=8)
    elif fused is False:  # XLA baseline
        def chain(v):
            y = overlap_save(v, h, 1024)
            return noise_gate(y, 1024, 256, noise_frames=8)
    else:
        # a typo'd mode must never silently benchmark some other path
        check(False, f"unknown bench mode {fused!r}: chain, res_chain, "
              f"res_two, stream, stream1, stream_jnp, res_step, "
              f"res_env_step, True, False")

    @jax.jit
    def timed_loop(x):
        def body(_, carry):
            y = chain(carry)
            # tiny data dependency: forces sequential execution, changes
            # the signal by ~1e-7 relative — irrelevant to timing
            y = y[..., : carry.shape[-1]]
            pad = carry.shape[-1] - y.shape[-1]
            yp = jnp.pad(y, ((0, 0), (0, pad))) if pad else y
            return carry + 1e-12 * yp

        # scalar checksum: fetching it to the host forces full execution
        # (block_until_ready alone does not await completion on remote/
        # relayed execution backends)
        return jnp.sum(jnp.abs(lax.fori_loop(0, iters, body, x)[:, :256]))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, n)).astype(dtype))

    float(timed_loop(x))  # compile + warm (host fetch = full sync)
    # distinct timed input so an RPC-level result cache cannot serve the
    # warm-up answer again — DERIVED ON-DEVICE and materialized before
    # t0: the transport defers fresh host-array uploads into the first
    # consuming call (CLAUDE.md; pease A/B postmortem, docs/KERNELS.md)
    x2 = x * jnp.asarray(1.000001, dtype)
    float(jnp.sum(jnp.abs(x2[:, :64])))
    t0 = time.perf_counter()
    checksum = float(timed_loop(x2))
    dt = (time.perf_counter() - t0) / iters
    check(np.isfinite(checksum), f"non-finite checksum: {checksum}")

    total_samples = channels * n
    # fs is the INPUT rate the samples/s figure counts (44.1 kHz for the
    # res* modes): the real-time-channels baseline must use the same rate
    return total_samples / dt, fs


def main():
    import sys

    # optional mode arg: chain (default/driver metric), res_chain,
    # res_two, True (two kernels), False (XLA)
    mode = sys.argv[1] if len(sys.argv) > 1 else "chain"
    mode = {"True": True, "False": False}.get(mode, mode)
    samples_per_s, in_rate = bench_fir_stft_chain(fused=mode)
    name = "samples_per_s_per_chip_48k_fir_stft_chain"
    if mode != "chain":
        name += f"_{mode}"
    print(json.dumps({
        "metric": name,
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        # real-time channels sustained at the mode's INPUT rate
        "vs_baseline": round(samples_per_s / in_rate, 2),
    }))


if __name__ == "__main__":
    main()
