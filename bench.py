"""Benchmark driver: samples/s/chip on the 48 kHz FIR+STFT chain
(the primary metric, BASELINE.json:2).

Runs the flagship chain (64-tap FIR overlap-save + 1024/256 STFT noise
gate) on a multichannel 48 kHz signal on one chip, and prints ONE JSON
line::

    {"metric": "...", "value": N, "unit": "samples/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.json:13 "published": {});
``vs_baseline`` is therefore reported against the natural reference point
for an audio pipeline: single-channel real-time at 48 kHz (value / 48000 =
how many real-time 48 kHz channels one chip sustains through the chain).
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_fir_stft_chain(
    channels: int = 64,
    seconds: float = 10.0,
    fs: int = 48000,
    iters: int = 10,
    dtype=np.float32,
):
    import jax
    import jax.numpy as jnp

    from audiosignalprocess_tpu.cpu_ref import oracle
    from audiosignalprocess_tpu.effects.noise_gate import noise_gate
    from audiosignalprocess_tpu.ops.overlap_save import overlap_save

    n = int(seconds * fs)
    n = (n // 256) * 256  # hop-aligned
    h = oracle.design_fir(64, 0.3)

    @jax.jit
    def chain(x):
        y = overlap_save(x, h, 1024)
        return noise_gate(y, 1024, 256, noise_frames=8)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((channels, n)).astype(dtype))

    # warmup/compile
    jax.block_until_ready(chain(x))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = chain(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    total_samples = channels * n
    return total_samples / dt


def main():
    samples_per_s = bench_fir_stft_chain()
    print(json.dumps({
        "metric": "samples_per_s_per_chip_48k_fir_stft_chain",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / 48000.0, 2),
    }))


if __name__ == "__main__":
    main()
