"""Fully-fused resample+FIR+gate kernel vs the oracle chain (interpret)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.res_chain_kernel import (
    resample_fir_gate_fused,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(53)


def _mk(rng, c, n, fs=44100):
    t = np.arange(n) / fs
    x = 0.01 * rng.standard_normal((c, n))
    x += np.where((t > 0.2 * n / fs) & (t < 0.7 * n / fs),
                  np.sin(2 * np.pi * 440.0 * t), 0.0)
    return x


def _oracle_chain(x, up, down, h, **kw):
    y = oracle.resample_poly(x, up, down, zero_phase=False)
    return oracle.noise_gate(oracle.fir_direct(y, h), **kw)


def test_vs_oracle_f64(rng):
    up, down = 160, 147
    n = 147 * 160 * 2
    x = _mk(rng, 2, n)
    h = oracle.design_fir(64, 0.3)
    out = np.asarray(resample_fir_gate_fused(x, up, down, h, noise_frames=4))
    ref = np.stack([_oracle_chain(x[c], up, down, h, noise_frames=4)
                    for c in range(2)])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)


def test_f32_snr(rng):
    up, down = 160, 147
    n = 147 * 160 * 2
    x = _mk(rng, 2, n).astype(np.float32)
    h = oracle.design_fir(64, 0.3)
    out = np.asarray(resample_fir_gate_fused(x, up, down, h, noise_frames=4))
    ref = np.stack([_oracle_chain(x[c].astype(np.float64), up, down, h,
                                  noise_frames=4) for c in range(2)])
    assert oracle.snr_db(ref, out.astype(np.float64)) >= 60.0


def test_release_and_simple_ratio(rng):
    """2:1 ratio (R5=1 supercycle path) + release smoothing carry."""
    up, down = 2, 1
    n = 16384
    x = _mk(rng, 2, n, fs=24000)
    h = oracle.design_fir(96, 0.25)
    out = np.asarray(resample_fir_gate_fused(x, up, down, h, noise_frames=4,
                                             release=0.7))
    ref = np.stack([_oracle_chain(x[c], up, down, h, noise_frames=4,
                                  release=0.7) for c in range(2)])
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-10)


def test_long_fir(rng):
    """FIR taps > one supercycle exercise the e0 prefix alignment."""
    up, down = 160, 147
    n = 147 * 160 * 2
    x = _mk(rng, 1, n)
    h = oracle.design_fir(384, 0.2)
    out = np.asarray(resample_fir_gate_fused(x, up, down, h, noise_frames=4))
    ref = _oracle_chain(x[0], up, down, h, noise_frames=4)
    np.testing.assert_allclose(out[0], ref, rtol=1e-8, atol=1e-10)
