"""Metrics: SNR parity checks + TPU roofline model (SURVEY.md §6).

The roofline targets come from BASELINE.json:5 — per-chip FFT kernel
throughput >= 80% of the HBM-bandwidth bound; batched small-N FFTs are
memory-bound, so speed-of-light = move each sample in and out of HBM once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


def snr_db(ref, test) -> float:
    """Signal-to-error ratio in dB."""
    ref = np.asarray(ref, dtype=np.float64)
    test = np.asarray(test, dtype=np.float64)
    err = ref - test
    p_sig = float(np.sum(ref * ref))
    p_err = float(np.sum(err * err))
    if p_err == 0.0:
        return math.inf
    if p_sig == 0.0:
        # all-zero reference with nonzero error: any leakage is infinitely
        # worse than the (silent) signal — report -inf, don't raise a
        # math-domain error out of an assertion helper
        return -math.inf
    return 10.0 * math.log10(p_sig / p_err)


@dataclass
class ChipSpec:
    """Per-chip hardware ceilings used for roofline accounting."""

    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    f32_tflops: float  # MXU f32 peak
    bf16_tflops: float  # MXU bf16 peak


# TPU v5e (v5 lite) public specs: 819 GB/s HBM, 197 TFLOP/s bf16 (f32 ~49).
TPU_V5E = ChipSpec(name="tpu-v5e", hbm_gbps=819.0, f32_tflops=49.0, bf16_tflops=197.0)


def detect_chip() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_V5E
    return TPU_V5E  # default model; only affects the roofline denominator


def fft_roofline_bytes(batch: int, n: int, dtype_bytes: int = 4,
                       complex_io: bool = False) -> int:
    """Minimum HBM traffic of a batched FFT: read + write each element once."""
    width = 2 * dtype_bytes if complex_io else dtype_bytes
    return 2 * batch * n * width


def roofline_time_s(bytes_moved: int, chip: ChipSpec) -> float:
    return bytes_moved / (chip.hbm_gbps * 1e9)
