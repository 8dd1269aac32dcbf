"""C oracle (native/asp_ref.c) vs numpy oracle: the two golden references
must agree to near machine precision (SURVEY.md §2 native components)."""

import shutil

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle

native = pytest.importorskip("audiosignalprocess_tpu.native")

pytestmark = pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(37)


def test_window():
    for kind in ("rect", "hann", "hamming", "blackman"):
        for periodic in (True, False):
            np.testing.assert_allclose(
                native.window(kind, 64, periodic),
                oracle.window(kind, 64, periodic), rtol=1e-12, atol=1e-15,
            )


@pytest.mark.parametrize("n", (2, 8, 64, 1024))
def test_fft_radix2(rng, n):
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    np.testing.assert_allclose(native.fft_radix2(x), oracle.fft_radix2(x),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(native.ifft_radix2(x), oracle.ifft_radix2(x),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", (4, 64, 512))
def test_fft_splitradix(rng, n):
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    np.testing.assert_allclose(native.fft_splitradix(x), oracle.fft_splitradix(x),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("n", (4, 256, 2048))
def test_rfft_irfft(rng, n):
    x = rng.standard_normal(n)
    np.testing.assert_allclose(native.rfft(x), oracle.rfft(x), rtol=1e-9, atol=1e-9)
    s = oracle.rfft(x)
    np.testing.assert_allclose(native.irfft(s, n), oracle.irfft(s, n),
                               rtol=1e-9, atol=1e-9)


def test_design_fir():
    for args in ((64, 0.25, "hann", True), (257, (0.2, 0.5), "hamming", False),
                 (129, 0.3, "blackman", False)):
        nt, c, wk, pz = args
        np.testing.assert_allclose(
            native.design_fir(nt, c, wk, pz), oracle.design_fir(nt, c, wk, pz),
            rtol=1e-10, atol=1e-12,
        )


def test_fir_and_overlap_save(rng):
    x = rng.standard_normal(3000)
    h = oracle.design_fir(64, 0.25)
    np.testing.assert_allclose(native.fir_direct(x, h), oracle.fir_direct(x, h),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(native.overlap_save(x, h, 1024),
                               oracle.overlap_save(x, h, 1024),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("up,down", ((160, 147), (2, 1), (3, 4)))
@pytest.mark.parametrize("zero_phase", (True, False))
def test_resample(rng, up, down, zero_phase):
    x = rng.standard_normal(2000)
    h = oracle.resample_filter(up, down)
    np.testing.assert_allclose(
        native.resample_poly(x, up, down, h, zero_phase),
        oracle.resample_poly(x, up, down, h=h, zero_phase=zero_phase),
        rtol=1e-9, atol=1e-9,
    )


def test_stft_istft(rng):
    x = rng.standard_normal(8192)
    np.testing.assert_allclose(native.stft(x, 1024, 256), oracle.stft(x, 1024, 256),
                               rtol=1e-9, atol=1e-9)
    s = oracle.stft(x, 1024, 256)
    np.testing.assert_allclose(native.istft(s, 1024, 256), oracle.istft(s, 1024, 256),
                               rtol=1e-9, atol=1e-9)


def test_envelope(rng):
    x = np.sin(2 * np.pi * 440 * np.arange(4000) / 16000.0)
    h = oracle.design_fir(129, 0.01)
    np.testing.assert_allclose(native.envelope(x, h), oracle.envelope(x, h),
                               rtol=1e-9, atol=1e-9)


def test_noise_gate(rng):
    x = 0.01 * rng.standard_normal(16384)
    x[6000:12000] += np.sin(2 * np.pi * 440 * np.arange(6000) / 48000.0)
    np.testing.assert_allclose(native.noise_gate(x), oracle.noise_gate(x),
                               rtol=1e-9, atol=1e-9)


def test_batched_inputs(rng):
    """Native wrappers must transform every row of batched input."""
    x = rng.standard_normal((3, 128)) + 1j * rng.standard_normal((3, 128))
    np.testing.assert_allclose(native.fft_radix2(x), oracle.fft_radix2(x),
                               rtol=1e-9, atol=1e-9)
    xr = rng.standard_normal((3, 256))
    np.testing.assert_allclose(native.rfft(xr), oracle.rfft(xr),
                               rtol=1e-9, atol=1e-9)
    h = oracle.design_fir(17, 0.3)
    np.testing.assert_allclose(native.fir_direct(xr, h),
                               np.stack([oracle.fir_direct(r, h) for r in xr]),
                               rtol=1e-9, atol=1e-9)


def test_invalid_type2_design_raises():
    with pytest.raises(ValueError, match="invalid FIR design"):
        native.design_fir(10, 0.4, pass_zero=False)


def test_noise_gate_short_signal_clamps(rng):
    """C gate clamps noise_frames to the actual frame count (no OOB)."""
    x = 0.01 * rng.standard_normal(1024 + 3 * 256)  # 4 frames < 8
    out = native.noise_gate(x, noise_frames=8)
    ref = oracle.noise_gate(x, noise_frames=4)  # clamped equivalent
    np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-12)


def test_one_point_window_and_single_tap_design():
    """A 1-point symmetric window is [1.0] (scipy convention; the 0/0
    midpoint), so design_fir(numtaps=1) is the identity tap — both the
    Python oracle and the C oracle returned NaN before this was pinned."""
    np.testing.assert_array_equal(oracle.window("hann", 1, periodic=False),
                                  np.ones(1))
    np.testing.assert_array_equal(native.window("hann", 1, periodic=False),
                                  np.ones(1))
    np.testing.assert_allclose(oracle.design_fir(1, 0.5), [1.0], atol=1e-12)
    np.testing.assert_allclose(native.design_fir(1, 0.5), [1.0], atol=1e-12)


def test_noise_gate_invalid_geometry_raises(rng):
    """n < nfft and noise_frames <= 0 raise from the native binding
    (the C core signals *nout = -1 instead of UB)."""
    with pytest.raises(ValueError, match="shorter than one frame"):
        native.noise_gate(np.zeros(500), 1024, 256)
    with pytest.raises(ValueError, match="noise_frames"):
        native.noise_gate(0.01 * rng.standard_normal(5000), 1024, 256,
                          noise_frames=0)
