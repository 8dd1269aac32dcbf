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


def test_float64_decode_matches_python(rng, tmp_path):
    """The native reader decodes IEEE float64 WAVs (io/wav.py writes
    them); the pre-fix behavior was silent all-zeros output."""
    x = np.clip(0.5 * rng.standard_normal((2, 500)), -0.99, 0.99)
    path = str(tmp_path / "f64.wav")
    pywav.write_wav(path, x, 48000, bits=64, float_fmt=True)
    a, _ = pywav.read_wav(path, dtype=np.float32)
    b, _ = wav_native.read_wav(path)
    np.testing.assert_array_equal(a, b)
    assert np.abs(b).max() > 0.1  # not the old silent-zeros failure


def test_float64_native_write_raises(tmp_path):
    """The native encoder is float32-planar in; a float64 request must
    error (pointing at io.wav), never silently downgrade the format."""
    with pytest.raises(ValueError, match="float64"):
        wav_native.write_wav(str(tmp_path / "x.wav"), np.zeros((1, 10)),
                             48000, bits=64, float_fmt=True)


def test_unsupported_format_errors_not_silence(tmp_path):
    """An a-law (tag=6) WAV must raise from probe-supported readers, not
    decode to a full-length zero array."""
    import struct

    body = bytes(100 * 2)  # 100 stereo 8-bit frames of a-law junk
    hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 6, 2, 8000, 16000, 2, 8)
    hdr += b"data" + struct.pack("<I", len(body))
    path = str(tmp_path / "alaw.wav")
    with open(path, "wb") as f:
        f.write(hdr + body)
    with pytest.raises(ValueError, match="unsupported format"):
        wav_native.read_wav(path)
    with pytest.raises(ValueError):
        wav_native.WavReader(path)


def test_first_data_chunk_wins(rng, tmp_path):
    """Two data chunks: both readers must size AND decode the FIRST
    (io/wav.py convention); the old probe sized the last chunk and then
    read garbage past the first chunk's payload."""
    import struct

    x1 = np.clip(0.5 * rng.standard_normal(100), -0.99, 0.99)
    b1 = np.clip(np.round(x1 * 32768.0), -32768, 32767).astype("<i2").tobytes()
    b2 = np.zeros(200, dtype="<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + 8 + len(b1) + len(b2)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
    payload = b"data" + struct.pack("<I", len(b1)) + b1
    payload += b"data" + struct.pack("<I", len(b2)) + b2
    path = str(tmp_path / "two.wav")
    with open(path, "wb") as f:
        f.write(hdr + payload)
    a, _ = pywav.read_wav(path, dtype=np.float32)
    b, _ = wav_native.read_wav(path)
    assert a.shape == (1, 100) and b.shape == (1, 100)
    np.testing.assert_array_equal(a, b)


def test_truncated_fmt_chunk_errors(tmp_path):
    import struct

    hdr = b"RIFF" + struct.pack("<I", 20) + b"WAVE"
    hdr += b"fmt " + struct.pack("<I", 8) + bytes(8)  # 8-byte fmt: invalid
    path = str(tmp_path / "shortfmt.wav")
    with open(path, "wb") as f:
        f.write(hdr)
    with pytest.raises(ValueError):
        wav_native.probe(path)
    with pytest.raises(ValueError):
        pywav.read_wav(path)


def test_checkpoint_extension_normalized(tmp_path):
    """save_carry/load_carry agree on the .npz suffix regardless of the
    path the caller passes (np.savez appends it, np.load does not)."""
    import jax.numpy as jnp

    from audiosignalprocess_tpu.utils.checkpoint import load_carry, save_carry

    carry = {"a": jnp.arange(4.0), "b": jnp.zeros((2, 3))}
    p = str(tmp_path / "carry.state")  # no .npz
    save_carry(p, carry, 7)
    got, blk = load_carry(p, carry)
    assert blk == 7
    np.testing.assert_array_equal(np.asarray(got["a"]), np.arange(4.0))
