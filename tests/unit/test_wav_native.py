"""Native WAV I/O + ring buffer vs the python reader (SURVEY.md §2 row 1)."""

import os
import shutil
import tempfile

import numpy as np
import pytest

from audiosignalprocess_tpu.io import wav as pywav

wav_native = pytest.importorskip("audiosignalprocess_tpu.io.wav_native")

pytestmark = pytest.mark.skipif(shutil.which("cc") is None, reason="no C compiler")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(51)


@pytest.mark.parametrize("bits,float_fmt", ((16, False), (24, False), (32, False),
                                            (32, True)))
@pytest.mark.parametrize("nch", (1, 2, 8))
def test_native_read_matches_python(rng, tmp_path, bits, float_fmt, nch):
    x = np.clip(0.5 * rng.standard_normal((nch, 1000)), -0.99, 0.99)
    path = str(tmp_path / "t.wav")
    pywav.write_wav(path, x, 48000, bits=bits, float_fmt=float_fmt)
    a, ra = pywav.read_wav(path, dtype=np.float32)
    b, rb = wav_native.read_wav(path)
    assert ra == rb == 48000
    np.testing.assert_allclose(a, b, atol=2e-7)


@pytest.mark.parametrize("bits,float_fmt", ((16, False), (24, False), (32, True)))
def test_native_write_matches_python(rng, tmp_path, bits, float_fmt):
    x = np.clip(0.5 * rng.standard_normal((2, 500)), -0.99, 0.99).astype(np.float32)
    pa, pb = str(tmp_path / "py.wav"), str(tmp_path / "na.wav")
    pywav.write_wav(pa, x, 44100, bits=bits, float_fmt=float_fmt)
    wav_native.write_wav(pb, x, 44100, bits=bits, float_fmt=float_fmt)
    a, _ = pywav.read_wav(pa, dtype=np.float64)
    b, _ = pywav.read_wav(pb, dtype=np.float64)
    np.testing.assert_allclose(a, b, atol=1e-9)


def test_probe(tmp_path, rng):
    x = rng.standard_normal((3, 777)).astype(np.float32)
    path = str(tmp_path / "p.wav")
    pywav.write_wav(path, x, 96000, float_fmt=True)
    info = wav_native.probe(path)
    assert (info.sample_rate, info.num_channels, info.num_frames) == (96000, 3, 777)
    assert info.float_fmt == 1


class TestRingBuffer:
    def test_push_pop_roundtrip(self, rng):
        rb = wav_native.RingBuffer(channels=2, capacity=1024)
        x = rng.standard_normal((2, 700)).astype(np.float32)
        assert rb.push(x) == 700
        assert rb.readable == 700
        out, got = rb.pop(700)
        assert got == 700
        np.testing.assert_array_equal(out, x)

    def test_wraparound(self, rng):
        rb = wav_native.RingBuffer(channels=1, capacity=256)
        total_in, total_out = [], []
        for _ in range(10):
            x = rng.standard_normal((1, 200)).astype(np.float32)
            pushed = rb.push(x)
            total_in.append(x[:, :pushed])
            out, got = rb.pop(150, pad=False)
            total_out.append(out[:, :got])
        out, got = rb.pop(rb.readable, pad=False)
        total_out.append(out[:, :got])
        np.testing.assert_array_equal(np.concatenate(total_in, axis=1),
                                      np.concatenate(total_out, axis=1))

    def test_pad_short_read(self):
        rb = wav_native.RingBuffer(channels=1, capacity=64)
        rb.push(np.ones((1, 10), np.float32))
        out, got = rb.pop(32, pad=True)
        assert got == 10
        np.testing.assert_array_equal(out[0, :10], 1.0)
        np.testing.assert_array_equal(out[0, 10:], 0.0)
