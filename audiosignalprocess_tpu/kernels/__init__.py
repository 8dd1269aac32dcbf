"""Pallas TPU kernels for the hot inner loops (BASELINE.json:5):
FFT butterflies / four-step stages, fused overlap-save, fused STFT noise
gate, FIR MAC, polyphase phase-matrix MAC.  Design notes: docs/KERNELS.md.
"""

from audiosignalprocess_tpu.kernels.fft_kernel import (  # noqa: F401
    fft_complex,
    fft_fourstep,
    fft_radix2_stages,
)
from audiosignalprocess_tpu.kernels.fir_kernel import fir_mac  # noqa: F401
from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused  # noqa: F401
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused  # noqa: F401
from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac  # noqa: F401
