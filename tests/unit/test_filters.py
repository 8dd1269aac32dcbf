"""FIR design / direct FIR / overlap-save parity tests (SURVEY.md §2 rows 6-8)."""

import numpy as np
import pytest
import scipy.signal

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.ops.fir import design_fir, fir_direct
from audiosignalprocess_tpu.ops.overlap_save import overlap_save


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


class TestDesign:
    @pytest.mark.parametrize("numtaps", (63, 64, 255, 4096))
    @pytest.mark.parametrize("wk", ("hann", "hamming", "blackman"))
    def test_lowpass_matches_firwin(self, numtaps, wk):
        h = design_fir(numtaps, 0.25, window_kind=wk)
        ref = scipy.signal.firwin(numtaps, 0.25, window=wk.replace("hann", "hann"))
        np.testing.assert_allclose(h, ref, rtol=1e-10, atol=1e-12)

    def test_bandpass_matches_firwin(self):
        h = design_fir(257, (0.2, 0.5), window_kind="hamming", pass_zero=False)
        ref = scipy.signal.firwin(257, (0.2, 0.5), window="hamming", pass_zero=False)
        np.testing.assert_allclose(h, ref, rtol=1e-10, atol=1e-12)

    def test_highpass(self):
        h = design_fir(129, 0.3, window_kind="blackman", pass_zero=False)
        ref = scipy.signal.firwin(129, 0.3, window="blackman", pass_zero=False)
        np.testing.assert_allclose(h, ref, rtol=1e-10, atol=1e-12)


class TestFIRDirect:
    @pytest.mark.parametrize("taps", (1, 7, 64, 513))
    def test_vs_oracle(self, rng, taps):
        x = rng.standard_normal(2000)
        h = rng.standard_normal(taps)
        ref = oracle.fir_direct(x, h)
        out = np.asarray(fir_direct(x, h))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-9, atol=1e-9)

    def test_batched(self, rng):
        x = rng.standard_normal((3, 2, 500))
        h = rng.standard_normal(33)
        ref = np.stack([
            np.stack([oracle.fir_direct(x[i, j], h) for j in range(2)]) for i in range(3)
        ])
        np.testing.assert_allclose(np.asarray(fir_direct(x, h)), ref, rtol=1e-9, atol=1e-9)

    def test_history_continuity(self, rng):
        """Block-wise FIR with history == whole-signal FIR."""
        x = rng.standard_normal(1024)
        h = rng.standard_normal(65)
        ref = oracle.fir_direct(x, h)
        b = 256
        hist = np.zeros(64)
        outs = []
        for k in range(0, 1024, b):
            blk = x[k : k + b]
            outs.append(np.asarray(fir_direct(blk, h, history=hist)))
            hist = np.concatenate([hist, blk])[-64:]
        np.testing.assert_allclose(np.concatenate(outs), ref, rtol=1e-9, atol=1e-9)

    def test_f32_snr(self, rng):
        x = rng.standard_normal(4096).astype(np.float32)
        h = oracle.design_fir(64, 0.25)
        ref = oracle.fir_direct(x.astype(np.float64), h)
        out = np.asarray(fir_direct(x, h))
        assert oracle.snr_db(ref, out) >= 60.0


class TestOverlapSave:
    @pytest.mark.parametrize("impl", ("radix2", "matmul", "xla"))
    @pytest.mark.parametrize("taps,nfft", ((64, 1024), (64, 128), (4096, 8192)))
    def test_vs_direct(self, rng, impl, taps, nfft):
        x = rng.standard_normal(10000)
        h = oracle.design_fir(taps, 0.3) if taps > 1 else np.ones(1)
        ref = oracle.fir_direct(x, h)
        out = np.asarray(overlap_save(x, h, nfft, impl=impl))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    def test_oracle_overlap_save_matches_direct(self, rng):
        x = rng.standard_normal(5000)
        h = oracle.design_fir(64, 0.25)
        np.testing.assert_allclose(
            oracle.overlap_save(x, h, 1024), oracle.fir_direct(x, h), rtol=1e-9, atol=1e-9
        )

    def test_history_continuity(self, rng):
        x = rng.standard_normal(4096)
        h = oracle.design_fir(128, 0.2)
        ref = oracle.fir_direct(x, h)
        b = 1024
        hist = np.zeros(127)
        outs = []
        for k in range(0, 4096, b):
            blk = x[k : k + b]
            outs.append(np.asarray(overlap_save(blk, h, 2048, history=hist)))
            hist = np.concatenate([hist, blk])[-127:]
        np.testing.assert_allclose(np.concatenate(outs), ref, rtol=1e-8, atol=1e-8)

    def test_batched_f32_snr(self, rng):
        x = rng.standard_normal((8, 8192)).astype(np.float32)
        h = oracle.design_fir(64, 0.25)
        ref = np.stack([oracle.fir_direct(x[i].astype(np.float64), h) for i in range(8)])
        out = np.asarray(overlap_save(x, h, 1024))
        assert oracle.snr_db(ref, out) >= 60.0


class TestDesignValidation:
    def test_invalid_type2_design_raises(self):
        """Even numtaps with Nyquist-band gain has ~zero normalization
        gain; silently returning ~1e15 taps violated the parity contract."""
        with pytest.raises(ValueError, match="invalid FIR design"):
            design_fir(10, 0.4, pass_zero=False)
