"""Validate the float64 numpy oracle against numpy/scipy ground truth.

The oracle pins the framework's conventions (cpu_ref/oracle.py docstring);
these tests prove the pinned conventions are themselves correct DSP.
"""

import numpy as np
import pytest
import scipy.signal as sps

from audiosignalprocess_tpu.cpu_ref import oracle

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("n", [2, 8, 64, 256, 1024, 4096])
def test_fft_radix2_matches_numpy(n):
    x = RNG.standard_normal((3, n)) + 1j * RNG.standard_normal((3, n))
    np.testing.assert_allclose(oracle.fft_radix2(x), np.fft.fft(x), rtol=1e-10, atol=1e-9)


@pytest.mark.parametrize("n", [4, 8, 64, 512, 2048])
def test_fft_splitradix_matches_numpy(n):
    x = RNG.standard_normal((2, n)) + 1j * RNG.standard_normal((2, n))
    np.testing.assert_allclose(oracle.fft_splitradix(x), np.fft.fft(x), rtol=1e-10, atol=1e-9)


def test_ifft_roundtrip():
    x = RNG.standard_normal((2, 1024)) + 1j * RNG.standard_normal((2, 1024))
    np.testing.assert_allclose(oracle.ifft_radix2(oracle.fft_radix2(x)), x, atol=1e-10)


@pytest.mark.parametrize("n", [8, 256, 1024])
def test_rfft_irfft(n):
    x = RNG.standard_normal((5, n))
    np.testing.assert_allclose(oracle.rfft(x), np.fft.rfft(x), rtol=1e-10, atol=1e-9)
    np.testing.assert_allclose(oracle.irfft(oracle.rfft(x), n), x, atol=1e-10)


@pytest.mark.parametrize("kind", ["hann", "hamming", "blackman"])
@pytest.mark.parametrize("periodic", [True, False])
def test_windows_match_scipy(kind, periodic):
    n = 128
    w = oracle.window(kind, n, periodic=periodic)
    ref = sps.get_window(kind if kind != "blackman" else "blackman", n, fftbins=periodic)
    np.testing.assert_allclose(w, ref, atol=1e-12)


@pytest.mark.parametrize("numtaps,cutoff,pass_zero", [
    (64, 0.25, True),
    (65, 0.1, True),
    (257, [0.2, 0.5], False),
    (4097, 0.4, True),
])
def test_design_fir_matches_firwin(numtaps, cutoff, pass_zero):
    h = oracle.design_fir(numtaps, cutoff, "hann", pass_zero=pass_zero)
    ref = sps.firwin(numtaps, cutoff, window="hann", pass_zero=pass_zero, scale=True)
    np.testing.assert_allclose(h, ref, atol=1e-12)


def test_fir_direct_is_causal_truncated_convolve():
    x = RNG.standard_normal(1000)
    h = oracle.design_fir(64, 0.3)
    y = oracle.fir_direct(x, h)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, np.convolve(x, h)[:1000], atol=1e-12)


@pytest.mark.parametrize("taps,nfft,n", [(64, 1024, 5000), (64, 128, 100), (4096, 8192, 20000)])
def test_overlap_save_equals_direct(taps, nfft, n):
    x = RNG.standard_normal(n)
    h = oracle.design_fir(taps, 0.25)
    np.testing.assert_allclose(oracle.overlap_save(x, h, nfft), oracle.fir_direct(x, h),
                               atol=1e-9)


@pytest.mark.parametrize("up,down", [(160, 147), (147, 160), (2, 1), (1, 3), (3, 2)])
def test_resample_poly_matches_scipy_zero_phase(up, down):
    x = RNG.standard_normal(4410)
    h = oracle.resample_filter(up, down)
    y = oracle.resample_poly(x, up, down, h=h, zero_phase=True)
    ref = sps.resample_poly(x, up, down, window=h / up)
    assert y.shape == ref.shape
    # edge handling differs (scipy pads); compare the interior
    m = max(len(h) // down, 32)
    assert oracle.snr_db(ref[m:-m], y[m:-m]) > 100.0


def test_resample_poly_causal_structure():
    x = RNG.standard_normal(1000)
    y = oracle.resample_poly(x, 160, 147, zero_phase=False)
    assert len(y) == -(-1000 * 160 // 147)


def test_stft_istft_roundtrip_cola():
    x = RNG.standard_normal(16384)
    nfft, hop = 1024, 256
    spec = oracle.stft(x, nfft, hop)
    nframes = 1 + (len(x) - nfft) // hop
    assert spec.shape == (nframes, nfft // 2 + 1)
    y = oracle.istft(spec, nfft, hop)
    assert len(y) == nfft + (nframes - 1) * hop
    # interior is perfectly reconstructed under WOLA
    assert oracle.snr_db(x[nfft : len(y) - nfft], y[nfft : len(y) - nfft]) > 100.0


def test_stft_matches_scipy_convention():
    x = RNG.standard_normal(8192)
    nfft, hop = 512, 128
    spec = oracle.stft(x, nfft, hop)
    # scipy ShortTimeFFT with same window, no padding reference check on frame 3
    w = oracle.window("hann", nfft, periodic=True)
    k = 3
    ref = np.fft.rfft(x[k * hop : k * hop + nfft] * w)
    np.testing.assert_allclose(spec[k], ref, atol=1e-9)


def test_envelope_tracks_am():
    fs = 16000
    t = np.arange(fs) / fs
    mod = 0.5 + 0.4 * np.sin(2 * np.pi * 3 * t)
    x = mod * np.sin(2 * np.pi * 1000 * t)
    h = oracle.design_fir(129, 2 * 50.0 / fs)
    env = oracle.envelope(x, h)
    # compare interior, allowing group delay of 64 samples
    d = 64
    err = env[1000:-1000] - mod[1000 - d : len(mod) - 1000 - d]
    assert np.sqrt(np.mean(err**2)) < 0.02


def test_hilbert_envelope_matches_scipy():
    x = RNG.standard_normal(4096)
    e = oracle.hilbert_envelope(x)
    ref = np.abs(sps.hilbert(x))
    np.testing.assert_allclose(e, ref, atol=1e-9)


def test_noise_gate_attenuates_noise_floor():
    fs = 48000
    t = np.arange(2 * fs) / fs
    rng = np.random.default_rng(1)
    noise = 0.01 * rng.standard_normal(len(t))
    tone = np.where(t > 1.0, np.sin(2 * np.pi * 440 * t), 0.0)
    x = tone + noise
    y = oracle.noise_gate(x, 1024, 256, threshold_db=10, reduction_db=40, noise_frames=8)
    n = len(y)
    # noise-only region strongly attenuated; tone region preserved
    p_noise_in = np.mean(x[4096 : fs - 4096] ** 2)
    p_noise_out = np.mean(y[4096 : fs - 4096] ** 2)
    assert p_noise_out < p_noise_in * 0.05
    p_tone_in = np.mean(x[fs + 4096 : n - 4096] ** 2)
    p_tone_out = np.mean(y[fs + 4096 : n - 4096] ** 2)
    assert abs(p_tone_out / p_tone_in - 1.0) < 0.1


def test_time_stretch_length():
    x = np.sin(2 * np.pi * 440 * np.arange(32768) / 48000)
    y = oracle.time_stretch(x, 2.0)
    assert abs(len(y) - len(x) / 2) < 2048
    y2 = oracle.time_stretch(x, 0.5)
    assert abs(len(y2) - len(x) * 2) < 4096


def test_pitch_shift_moves_peak():
    fs = 16000
    x = np.sin(2 * np.pi * 440 * np.arange(65536) / fs)
    y = oracle.pitch_shift(x, 12.0)  # one octave up
    spec = np.abs(np.fft.rfft(y[4096 : 4096 + 32768] * np.hanning(32768)))
    peak = np.argmax(spec) * fs / 32768
    assert abs(peak - 880) < 15
