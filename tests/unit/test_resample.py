"""Polyphase resampler parity tests (SURVEY.md §2 row 9)."""

import numpy as np
import pytest
import scipy.signal

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.ops.resample import history_len, resample_filter, resample_poly

RATIOS = ((160, 147), (147, 160), (2, 1), (1, 2), (3, 4), (1, 1))


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


class TestOracleVsScipy:
    @pytest.mark.parametrize("up,down", RATIOS)
    def test_zero_phase_matches_scipy(self, rng, up, down):
        """Oracle zero-phase resample == scipy.resample_poly given the same
        prototype filter (scipy's `window=` takes the taps directly)."""
        if up == down:
            # the ONE expected skip in a green suite: the identity ratio
            # has no prototype filter to hand scipy (resample_filter(1,1)
            # is the passthrough), so there is no scipy reference to
            # compare against.  Identity-ratio BEHAVIOR is still covered:
            # TestJaxResample::test_vs_oracle runs (1, 1) against the
            # oracle, which returns the input unchanged.
            pytest.skip("identity ratio has no prototype filter, so no "
                        "scipy reference exists (behavior covered by "
                        "TestJaxResample (1,1) vs the oracle)")
        x = rng.standard_normal(2000)
        h = resample_filter(up, down)
        ref = scipy.signal.resample_poly(x, up, down, window=h / up)
        out = oracle.resample_poly(x, up, down, h=h, zero_phase=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)


class TestJaxResample:
    @pytest.mark.parametrize("up,down", RATIOS)
    @pytest.mark.parametrize("zero_phase", (True, False))
    def test_vs_oracle(self, rng, up, down, zero_phase):
        x = rng.standard_normal(2940)  # multiple of 147 and 160? 2940=147*20
        out = np.asarray(resample_poly(x, up, down, zero_phase=zero_phase))
        ref = oracle.resample_poly(x, up, down, zero_phase=zero_phase)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    def test_441_to_48_tone(self, rng):
        """A 1 kHz tone at 44.1k resampled to 48k stays a 1 kHz tone."""
        fs0, fs1 = 44100, 48000
        n = 44100
        t = np.arange(n) / fs0
        x = np.sin(2 * np.pi * 1000.0 * t)
        y = np.asarray(resample_poly(x, 160, 147))
        assert y.shape[-1] == -(-n * 160 // 147)
        # interior spectral check: dominant bin at 1 kHz
        seg = y[4800 : 4800 + 8192]
        spec = np.abs(np.fft.rfft(seg * np.hanning(8192)))
        peak = np.argmax(spec)
        f_peak = peak * fs1 / 8192
        assert abs(f_peak - 1000.0) < 12.0

    def test_batched(self, rng):
        x = rng.standard_normal((4, 1470))
        out = np.asarray(resample_poly(x, 160, 147))
        ref = np.stack([oracle.resample_poly(x[i], 160, 147) for i in range(4)])
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    @pytest.mark.parametrize("up,down", ((160, 147), (2, 1), (3, 4)))
    def test_streaming_history(self, rng, up, down):
        """Block-wise resample with history == whole-signal causal resample."""
        n = down * 64 * 4
        x = rng.standard_normal(n)
        ref = oracle.resample_poly(x, up, down, zero_phase=False)
        h = resample_filter(up, down)
        hl = history_len(len(h), up, down)
        b = down * 64
        hist = np.zeros(hl)
        outs = []
        for k in range(0, n, b):
            blk = x[k : k + b]
            outs.append(np.asarray(resample_poly(blk, up, down, h=h,
                                                 zero_phase=False, history=hist)))
            hist = np.concatenate([hist, blk])[-hl:] if hl else hist
        got = np.concatenate(outs)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-8)

    def test_f32_snr(self, rng):
        x = rng.standard_normal(14700).astype(np.float32)
        ref = oracle.resample_poly(x.astype(np.float64), 160, 147)
        out = np.asarray(resample_poly(x, 160, 147))
        assert oracle.snr_db(ref, out) >= 60.0
