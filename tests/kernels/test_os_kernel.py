"""Fused overlap-save Pallas kernel tests (interpret mode)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(41)


@pytest.mark.parametrize("taps,nfft", ((64, 1024), (64, 256), (512, 2048)))
def test_vs_oracle_f64(rng, taps, nfft):
    x = rng.standard_normal((3, 9000))
    h = oracle.design_fir(taps, 0.3) if taps >= 8 else rng.standard_normal(taps)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(3)])
    out = np.asarray(overlap_save_fused(x, h, nfft, blocks_per_step=4))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


def test_f32_snr(rng):
    x = rng.standard_normal((8, 16384)).astype(np.float32)
    h = oracle.design_fir(64, 0.25)
    ref = np.stack([oracle.fir_direct(x[i].astype(np.float64), h) for i in range(8)])
    out = np.asarray(overlap_save_fused(x, h, 1024))
    assert oracle.snr_db(ref, out) >= 60.0


def test_history_streaming(rng):
    x = rng.standard_normal(8192)
    h = oracle.design_fir(128, 0.2)
    ref = oracle.fir_direct(x, h)
    hist = np.zeros((1, 127))
    outs = []
    for k in range(0, 8192, 2048):
        blk = x[None, k : k + 2048]
        outs.append(np.asarray(overlap_save_fused(blk, h, 2048, history=hist,
                                                  blocks_per_step=2))[0])
        hist = np.concatenate([hist, blk], axis=-1)[:, -127:]
    np.testing.assert_allclose(np.concatenate(outs), ref, rtol=1e-8, atol=1e-8)


def test_odd_batch_and_length(rng):
    x = rng.standard_normal((5, 3333))
    h = oracle.design_fir(33, 0.4)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(5)])
    out = np.asarray(overlap_save_fused(x, h, 512, blocks_per_step=3, batch_tile=2))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("taps,nfft", ((512, 4096), (4096, 16384)))
def test_large_nfft(rng, taps, nfft):
    """nfft 4096 exercises the sublane-MAC n1=32 path; 16384 the
    large-n1 dot fallback (config 4 shapes, BASELINE.json:10)."""
    x = rng.standard_normal((2, 4 * nfft))
    h = oracle.design_fir(taps, 0.1)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(2)])
    out = np.asarray(overlap_save_fused(x, h, nfft, blocks_per_step=2))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("taps,nfft", ((64, 256), (193, 512), (385, 512)))
def test_unaligned_emission_repair(rng, taps, nfft):
    """Pin the repaired 8-unaligned emission branch (os_kernel padr > 0:
    br<3 valid rows at an 8-unaligned e0r are emitted from the aligned-
    down offset with discard rows dropped in XLA).  Geometries cover
    br=1/padr=1 (64,256), br=2/padr=2 (193,512), br=1/padr=3 (385,512).
    Round-2 shipped this class as a hard reject — the repair must stay
    covered (VERDICT r2 weak #1)."""
    from audiosignalprocess_tpu.kernels.fft_kernel import _grid_split

    n1, n2 = _grid_split(nfft)
    e0 = -(-(taps - 1) // n2) * n2
    b = ((nfft - e0) // n2) * n2
    br, e0r = b // n2, e0 // n2
    assert br < 3 and e0r % 8 != 0, "geometry no longer hits the repair branch"
    x = rng.standard_normal((3, 4000))
    h = oracle.design_fir(taps, 0.3)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(3)])
    out = np.asarray(overlap_save_fused(x, h, nfft, blocks_per_step=4))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)
    # streaming with history crosses the emission slice at every block
    hist = np.zeros((3, taps - 1))
    outs = []
    for k in range(0, 4000, 1000):
        blk = x[:, k : k + 1000]
        outs.append(np.asarray(
            overlap_save_fused(blk, h, nfft, history=hist, blocks_per_step=2)))
        hist = np.concatenate([hist, blk], axis=-1)[:, -(taps - 1):]
    np.testing.assert_allclose(np.concatenate(outs, axis=-1), ref,
                               rtol=1e-8, atol=1e-8)
