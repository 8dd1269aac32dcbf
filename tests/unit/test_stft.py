"""STFT/ISTFT parity tests (SURVEY.md §2 rows 10-11)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.ops.stft import frame, istft, num_frames, overlap_add, stft


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(3)


class TestFraming:
    def test_frame_layout(self, rng):
        x = rng.standard_normal(1024 + 7 * 256)
        f = np.asarray(frame(x, 1024, 256))
        assert f.shape == (8, 1024)
        for k in range(8):
            np.testing.assert_array_equal(f[k], x[k * 256 : k * 256 + 1024])

    def test_num_frames(self):
        assert num_frames(1024, 1024, 256) == 1
        assert num_frames(1024 + 256, 1024, 256) == 2
        assert num_frames(48000, 1024, 256) == 1 + (48000 - 1024) // 256


class TestSTFT:
    @pytest.mark.parametrize("impl", ("radix2", "matmul", "xla"))
    @pytest.mark.parametrize("wk", ("hann", "hamming"))
    def test_vs_oracle(self, rng, impl, wk):
        x = rng.standard_normal(8192)
        ref = oracle.stft(x, 1024, 256, wk)
        out = np.asarray(stft(x, 1024, 256, wk, impl=impl))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    @pytest.mark.parametrize("impl", ("radix2", "matmul"))
    def test_istft_vs_oracle(self, rng, impl):
        x = rng.standard_normal(8192)
        spec = oracle.stft(x, 1024, 256)
        ref = oracle.istft(spec, 1024, 256)
        out = np.asarray(istft(spec, 1024, 256, impl=impl))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    def test_roundtrip_interior_identity(self, rng):
        """WOLA with hann/hop=nfft/4 reconstructs the signal exactly
        outside the edge taper (oracle.WOLA_EDGE_REL clamp: samples with
        window coverage < 0.1% of the interior divide by the clamp and
        taper toward zero instead of amplifying — oracle.py istft spec)."""
        x = rng.standard_normal(4096)
        y = np.asarray(istft(stft(x, 1024, 256), 1024, 256))
        nf = num_frames(4096, 1024, 256)
        n = y.shape[-1]
        assert n == 1024 + (nf - 1) * 256
        # taper width for hann/1024: w^2[i] < 1e-3 * 1.5 => i < 65
        w2 = oracle.window("hann", 1024, periodic=True) ** 2
        taper = int(np.searchsorted(w2[:512], 1e-3 * 1.5))
        assert 1 <= taper < 256
        np.testing.assert_allclose(y[taper:n - taper], x[taper : n - taper],
                                   rtol=1e-7, atol=1e-7)
        # tapered edge samples are attenuated, never amplified
        assert np.all(np.abs(y[:taper]) <= np.abs(x[:taper]) + 1e-12)
        assert np.all(np.abs(y[n - taper:]) <= np.abs(x[n - taper : n]) + 1e-12)

    def test_batched(self, rng):
        x = rng.standard_normal((3, 4096))
        ref = oracle.stft(x, 512, 128)
        out = np.asarray(stft(x, 512, 128))
        np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)

    def test_f32_snr(self, rng):
        x = rng.standard_normal((2, 16384)).astype(np.float32)
        ref = oracle.istft(oracle.stft(x.astype(np.float64), 1024, 256), 1024, 256)
        out = np.asarray(istft(stft(x, 1024, 256), 1024, 256))
        assert oracle.snr_db(ref, out) >= 60.0


class TestOverlapAdd:
    @pytest.mark.parametrize("hop", (256, 300))
    def test_matches_naive(self, rng, hop):
        fr = rng.standard_normal((5, 1024))
        nout = 1024 + 4 * hop
        ref = np.zeros(nout)
        for k in range(5):
            ref[k * hop : k * hop + 1024] += fr[k]
        np.testing.assert_allclose(np.asarray(overlap_add(fr, hop)), ref, rtol=1e-9, atol=1e-9)
