"""WAV I/O roundtrip tests (RIFF parse, PCM16/24/32/float, channels)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.io import read_wav, write_wav, stream_blocks

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("bits,float_fmt,tol", [
    (16, False, 2 ** -15),
    (24, False, 2 ** -23),
    (32, False, 1e-7),  # float32 return precision dominates PCM32
    (32, True, 1e-7),
])
@pytest.mark.parametrize("nch", [1, 2, 8])
def test_roundtrip(tmp_path, bits, float_fmt, tol, nch):
    x = np.clip(RNG.standard_normal((nch, 1000)) * 0.3, -1, 1).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 48000, bits=bits, float_fmt=float_fmt)
    y, rate = read_wav(p)
    assert rate == 48000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=tol * 1.01)


def test_mono_1d_write(tmp_path):
    x = np.sin(np.arange(256) * 0.1).astype(np.float32) * 0.5
    p = str(tmp_path / "m.wav")
    write_wav(p, x, 16000)
    y, rate = read_wav(p)
    assert y.shape == (1, 256) and rate == 16000


def test_stream_blocks_pads_final(tmp_path):
    x = RNG.standard_normal((2, 1000)).astype(np.float32) * 0.1
    p = str(tmp_path / "s.wav")
    write_wav(p, x, 48000, float_fmt=True)
    blocks = list(stream_blocks(p, 256))
    assert len(blocks) == 4
    assert all(b.shape == (2, 256) for b in blocks)
    cat = np.concatenate(blocks, axis=1)[:, :1000]
    np.testing.assert_allclose(cat, x, atol=1e-7)


def test_odd_data_chunk_pad(tmp_path):
    """24-bit mono with odd frame count: data chunk gets a RIFF pad byte
    and the file still round-trips."""
    import os

    x = np.linspace(-0.5, 0.5, 1001)
    p = str(tmp_path / "odd.wav")
    write_wav(p, x, 8000, bits=24)
    assert os.path.getsize(p) % 2 == 0
    y, rate = read_wav(p, dtype=np.float64)
    assert rate == 8000 and y.shape == (1, 1001)
    np.testing.assert_allclose(y[0], x, atol=2e-7)
