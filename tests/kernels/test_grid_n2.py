"""ASP_GRID_N2 override coverage for the fused grid kernels.

n2 > 128 exercises the HBM DMA row-alignment path (hbm_fetch_rows:
(8, 128)-tiled row-space arrays need 8-aligned DMA row windows); the
parity assertions pin the padding/index math at those geometries.
Interpret mode (conftest) — the on-chip twin is tools/tpu_selfcheck.py
plus the n2=256 hardware check recorded in docs/PERF.md.
"""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.chain_kernel import fir_noise_gate_fused
from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(77)


@pytest.mark.parametrize("n2", ("256", "512"))
def test_os_fused_wide_lanes(rng, monkeypatch, n2):
    monkeypatch.setenv("ASP_GRID_N2", n2)
    x = rng.standard_normal((3, 9000))
    h = oracle.design_fir(63, 0.3)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(3)])
    out = np.asarray(overlap_save_fused(x, h, 1024, blocks_per_step=3))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("n2", ("256",))
def test_gate_fused_wide_lanes(rng, monkeypatch, n2):
    monkeypatch.setenv("ASP_GRID_N2", n2)
    x = rng.standard_normal((2, 12000))
    ref = np.stack([oracle.noise_gate(x[i], nfft=1024, hop=256,
                                      threshold_db=-10.0) for i in range(2)])
    out = np.asarray(noise_gate_fused(x, nfft=1024, hop=256,
                                      threshold_db=-10.0))
    m = min(out.shape[-1], ref.shape[-1])
    assert oracle.snr_db(ref[:, :m], out[:, :m]) >= 100.0


def test_chain_fused_wide_lanes(rng, monkeypatch):
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


def test_n2_below_128_guard(monkeypatch):
    """n2 < 128 cannot DMA-slice the lane dim on hardware; the guard
    must raise the clear error when not interpreting."""
    from audiosignalprocess_tpu.kernels import fft_kernel

    monkeypatch.setenv("ASP_GRID_N2", "64")
    monkeypatch.delenv("ASP_INTERPRET_PALLAS", raising=False)
    monkeypatch.setattr(fft_kernel, "_interpret", lambda: False)
    with pytest.raises(ValueError, match="cannot run on TPU hardware"):
        fft_kernel._grid_split(1024)
