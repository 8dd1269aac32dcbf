"""Effects parity tests: envelope/AM demod, noise gate, phase vocoder
(SURVEY.md §2 rows 12-14)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.effects.envelope import (
    am_demod, default_envelope_fir, envelope, hilbert_envelope,
)
from audiosignalprocess_tpu.effects.noise_gate import noise_gate
from audiosignalprocess_tpu.effects.phase_vocoder import pitch_shift, time_stretch


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


class TestEnvelope:
    def test_vs_oracle(self, rng):
        fs = 16000
        t = np.arange(8000) / fs
        x = (1.0 + 0.5 * np.sin(2 * np.pi * 5.0 * t)) * np.sin(2 * np.pi * 1000.0 * t)
        h = default_envelope_fir(fs)
        ref = oracle.envelope(x, h)
        out = np.asarray(envelope(x, h))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)

    def test_am_demod_vs_oracle(self, rng):
        fs = 16000
        t = np.arange(8000) / fs
        x = (1.0 + 0.5 * np.sin(2 * np.pi * 5.0 * t)) * np.sin(2 * np.pi * 1000.0 * t)
        h = default_envelope_fir(fs)
        ref = oracle.am_demod(x, h)
        out = np.asarray(am_demod(x, h))
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    def test_tracks_modulation(self):
        """Envelope of (1+0.5 sin(2pi*5t)) sin(2pi*1000t) ~ the modulator."""
        fs = 16000
        t = np.arange(16000) / fs
        mod = 1.0 + 0.5 * np.sin(2 * np.pi * 5.0 * t)
        x = mod * np.sin(2 * np.pi * 1000.0 * t)
        h = default_envelope_fir(fs)
        e = np.asarray(envelope(x, h))
        d = (len(h) - 1) // 2
        err = e[2000:-2000] - mod[2000 - d : len(t) - 2000 - d]
        assert np.sqrt(np.mean(err**2)) < 0.02

    def test_hilbert_envelope(self, rng):
        x = rng.standard_normal(4096)
        ref = oracle.hilbert_envelope(x)
        out = np.asarray(hilbert_envelope(x))
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


class TestNoiseGate:
    def _mk_signal(self, rng):
        fs = 48000
        n = 48000
        t = np.arange(n) / fs
        noise = 0.01 * rng.standard_normal(n)
        burst = np.where((t > 0.4) & (t < 0.7), np.sin(2 * np.pi * 440.0 * t), 0.0)
        return noise + burst

    @pytest.mark.parametrize("release", (0.0, 0.9))
    def test_vs_oracle(self, rng, release):
        x = self._mk_signal(rng)
        ref = oracle.noise_gate(x, release=release)
        out = np.asarray(noise_gate(x, release=release))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-9)

    def test_attenuates_noise_keeps_signal(self, rng):
        x = self._mk_signal(rng)
        y = np.asarray(noise_gate(x))
        fs = 48000
        # noise-only region well attenuated
        noise_reg = slice(int(0.1 * fs), int(0.3 * fs))
        sig_reg = slice(int(0.45 * fs), int(0.65 * fs))
        # 6 dB over the mean floor leaves the Rayleigh tail of the noise
        # bins open, so expect strong but not total attenuation.
        assert np.std(y[noise_reg]) < 0.5 * np.std(x[noise_reg])
        assert np.std(y[sig_reg]) > 0.8 * np.std(x[sig_reg])

    def test_batched(self, rng):
        x = np.stack([self._mk_signal(rng) for _ in range(3)])
        ref = np.stack([oracle.noise_gate(x[i]) for i in range(3)])
        out = np.asarray(noise_gate(x))
        np.testing.assert_allclose(out, ref, rtol=1e-7, atol=1e-9)

    def test_no_edge_click(self, rng):
        """Gated output never exceeds the input peak at the WOLA edges.

        Masked spectra are not window-shaped, so dividing the first/last
        ramp samples by their raw w^2 norm (~1e-10) amplified residual
        noise into a full-scale click (measured |y| ~ 66 for a +-1
        signal) before the oracle.WOLA_EDGE_REL norm clamp."""
        x = self._mk_signal(rng)
        y = np.asarray(noise_gate(x, threshold_db=12.0))
        assert np.max(np.abs(y)) <= 1.05 * np.max(np.abs(x))
        # the edge regions themselves stay at/below the gated noise level
        assert np.max(np.abs(y[:256])) < 0.1
        assert np.max(np.abs(y[-256:])) < 0.1


class TestPhaseVocoder:
    def test_time_stretch_vs_oracle(self, rng):
        x = np.sin(2 * np.pi * 440.0 * np.arange(16384) / 48000.0)
        for rate in (0.5, 1.0, 1.7):
            ref = oracle.time_stretch(x, rate)
            out = np.asarray(time_stretch(x, rate))
            assert out.shape == ref.shape, rate
            np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-8)

    def test_stretch_length(self):
        x = np.sin(2 * np.pi * 440.0 * np.arange(48000) / 48000.0)
        y = np.asarray(time_stretch(x, 2.0))
        assert 0.4 < y.shape[-1] / x.shape[-1] < 0.6
        y2 = np.asarray(time_stretch(x, 0.5))
        assert 1.8 < y2.shape[-1] / x.shape[-1] < 2.2

    def test_pitch_shift_moves_peak(self):
        fs = 48000
        x = np.sin(2 * np.pi * 440.0 * np.arange(fs) / fs)
        y = np.asarray(pitch_shift(x, 12.0))  # +1 octave
        seg = y[8192 : 8192 + 16384]
        spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
        f_peak = np.argmax(spec) * fs / len(seg)
        assert abs(f_peak - 880.0) < 25.0

    def test_pitch_shift_vs_oracle(self):
        x = np.sin(2 * np.pi * 440.0 * np.arange(16384) / 48000.0)
        ref = oracle.pitch_shift(x, 3.0)
        out = np.asarray(pitch_shift(x, 3.0))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-8)
