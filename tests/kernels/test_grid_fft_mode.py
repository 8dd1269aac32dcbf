"""ASP_GRID_FFT mode coverage for the fused grid kernels.

"butterfly" swaps the n2-side (lane-axis) DFT from the bf16x3 MXU
contraction to exact-f32 Stockham stages via an in-VMEM transpose
(fft_kernel.dft_lanes_butterfly).  These tests pin the parity of that
path against the float64 oracle at both default and overridden grid
splits; the on-chip A/B (matmul wins on throughput, butterfly on SNR)
is recorded in docs/PERF.md.  Interpret mode (conftest).
"""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.chain_kernel import fir_noise_gate_fused
from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(91)


def test_os_fused_butterfly(rng, monkeypatch):
    monkeypatch.setenv("ASP_GRID_FFT", "butterfly")
    x = rng.standard_normal((3, 9000))
    h = oracle.design_fir(63, 0.3)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(3)])
    out = np.asarray(overlap_save_fused(x, h, 1024, blocks_per_step=3))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


def test_gate_fused_butterfly(rng, monkeypatch):
    monkeypatch.setenv("ASP_GRID_FFT", "butterfly")
    x = rng.standard_normal((2, 12000))
    ref = np.stack([oracle.noise_gate(x[i], nfft=1024, hop=256,
                                      threshold_db=-10.0) for i in range(2)])
    out = np.asarray(noise_gate_fused(x, nfft=1024, hop=256,
                                      threshold_db=-10.0))
    m = min(out.shape[-1], ref.shape[-1])
    assert oracle.snr_db(ref[:, :m], out[:, :m]) >= 100.0


def test_chain_fused_butterfly_wide_lanes(rng, monkeypatch):
    """butterfly composes with the ASP_GRID_N2 override (the transform
    axis width is n2 itself, so the stage count changes with the split)."""
    monkeypatch.setenv("ASP_GRID_FFT", "butterfly")
    monkeypatch.setenv("ASP_GRID_N2", "256")
    x = rng.standard_normal((2, 12000))
    h = oracle.design_fir(63, 0.3)
    ref = np.stack([oracle.noise_gate(oracle.fir_direct(x[i], h), nfft=1024,
                                      hop=256, threshold_db=-10.0)
                    for i in range(2)])
    out = np.asarray(fir_noise_gate_fused(x, h, nfft=1024, hop=256,
                                          threshold_db=-10.0))
    m = min(out.shape[-1], ref.shape[-1])
    assert oracle.snr_db(ref[:, :m], out[:, :m]) >= 100.0


@pytest.mark.parametrize("mode", ["matmul", "butterfly"])
def test_os_fused_large_n1_fallback(rng, monkeypatch, mode):
    """nfft=16384 splits to n1=128 > _MAC_MAX_N1, taking the dot_general
    fallback branch of fourstep_grid_fwd — in butterfly mode that branch
    has its own (..., b, c) -> lanes relayout which no other test hits."""
    monkeypatch.setenv("ASP_GRID_FFT", mode)
    x = rng.standard_normal((2, 30000))
    h = oracle.design_fir(4097, 0.1)  # config-4 class geometry
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(2)])
    out = np.asarray(overlap_save_fused(x, h, 16384, blocks_per_step=1))
    np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-7)


def test_unknown_mode_raises(monkeypatch):
    from audiosignalprocess_tpu.kernels import fft_kernel

    monkeypatch.setenv("ASP_GRID_FFT", "bf16")
    with pytest.raises(ValueError, match="ASP_GRID_FFT"):
        fft_kernel._grid_fft_mode()
    monkeypatch.setenv("ASP_MATMUL_MODE", "bf16")
    with pytest.raises(ValueError, match="ASP_MATMUL_MODE"):
        fft_kernel._matmul_mode()
