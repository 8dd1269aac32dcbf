"""VMEM-budget tile model (fft_kernel.vmem_tile_cap, ASP_VMEM_MB).

The fused-kernel wrappers cap their batch tiles with an analytic
working-set model so big geometries (e.g. 16384-pt FFTs) scale the tile
down instead of hitting Mosaic VMEM-exceeded errors; `tools/tune_tiles.py`
is the measured (profile-guided) complement.  These tests pin the model's
contract and that a budget-shrunk tile preserves kernel parity.
"""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels import fft_kernel
from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused


def test_cap_scales_inversely_with_geometry():
    small = fft_kernel.vmem_tile_cap(12, 8 * 1024, 4)
    big = fft_kernel.vmem_tile_cap(12, 8 * 16384, 4)
    assert big < small
    assert big >= 8  # floor: one sublane tile


def test_budget_env_override(monkeypatch):
    base = fft_kernel.vmem_tile_cap(10, 8 * 1024, 4)
    monkeypatch.setenv("ASP_VMEM_MB", "96")
    assert fft_kernel.vmem_tile_cap(10, 8 * 1024, 4) == 2 * base
    monkeypatch.setenv("ASP_VMEM_MB", "1")
    assert fft_kernel.vmem_tile_cap(10, 1024 * 1024, 4) == 8


def test_default_geometry_tiles_unchanged():
    """The shipped defaults (nfft=1024 class) must keep their measured
    tiles: the cap only binds for bigger geometries."""
    assert fft_kernel.vmem_tile_cap(10, 8 * 1024, 4) >= 32   # os kernel
    assert fft_kernel.vmem_tile_cap(12, 8 * 1024, 4) >= 32   # gate kernel
    assert fft_kernel.vmem_tile_cap(10, 32 * 1024, 4) >= 32  # chain kernel


def test_parity_under_tiny_budget(monkeypatch):
    """A 1 MB budget forces the minimum tile; outputs are unchanged."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((4, 6000)).astype(np.float32)
    h = oracle.design_fir(63, 0.3)
    ref_os = np.asarray(overlap_save_fused(x, h, 1024))
    ref_g = np.asarray(noise_gate_fused(x, nfft=1024, hop=256,
                                        threshold_db=-10.0))
    monkeypatch.setenv("ASP_VMEM_MB", "1")
    out_os = np.asarray(overlap_save_fused(x, h, 1024))
    out_g = np.asarray(noise_gate_fused(x, nfft=1024, hop=256,
                                        threshold_db=-10.0))
    np.testing.assert_array_equal(ref_os, out_os)
    np.testing.assert_array_equal(ref_g, out_g)
