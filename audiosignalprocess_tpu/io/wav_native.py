"""ctypes binding for the native WAV I/O + ring buffer (native/asp_io.c).

Drop-in for io.wav's read/write on the hot host path: decode straight to
planar float32 in C (no numpy reshape/copy chain), plus an SPSC ring
buffer the streaming drivers use to overlap host decode with device
compute (BASELINE.json:11).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np
from audiosignalprocess_tpu.utils.validate import check

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SRC = os.path.join(_DIR, "asp_io.c")
_LIB = os.path.join(_DIR, "libasp_io.so")

_lib = None


class WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int),
        ("num_channels", ctypes.c_int),
        ("num_frames", ctypes.c_long),
        ("bits", ctypes.c_int),
        ("float_fmt", ctypes.c_int),
    ]


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
                       check=True, capture_output=True)
    l = ctypes.CDLL(_LIB)
    l.asp_wav_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(WavInfo)]
    l.asp_wav_read.argtypes = [ctypes.c_char_p,
                               ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    l.asp_wav_read.restype = ctypes.c_long
    l.asp_wav_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_int, ctypes.c_long, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
    l.asp_wav_open.restype = ctypes.c_void_p
    l.asp_wav_open.argtypes = [ctypes.c_char_p]
    l.asp_wav_reader_info.argtypes = [ctypes.c_void_p, ctypes.POINTER(WavInfo)]
    l.asp_wav_read_block.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long]
    l.asp_wav_read_block.restype = ctypes.c_long
    l.asp_wav_reader_close.argtypes = [ctypes.c_void_p]
    l.asp_ring_create.restype = ctypes.c_void_p
    l.asp_ring_create.argtypes = [ctypes.c_int, ctypes.c_long]
    l.asp_ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("asp_ring_writable", "asp_ring_readable"):
        getattr(l, fn).argtypes = [ctypes.c_void_p]
        getattr(l, fn).restype = ctypes.c_long
    l.asp_ring_push.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                ctypes.c_long]
    l.asp_ring_push.restype = ctypes.c_long
    l.asp_ring_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                               ctypes.c_long, ctypes.c_int]
    l.asp_ring_pop.restype = ctypes.c_long
    _lib = l
    return l


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


# asp_io.c return codes -> human-readable causes
_ERRORS = {
    -1: "cannot open file / out of memory",
    -2: "not a RIFF/WAVE file",
    -3: "truncated or malformed fmt chunk",
    -4: "missing or inconsistent fmt/data chunks",
    -5: "no data chunk payload",
    -6: "unsupported PCM bit depth",
    -7: "unsupported format (decoder handles PCM 8/16/24/32 and float 32/64)",
    -8: "file would exceed the 4 GiB RIFF size limit",
    -9: "float64 output unsupported by the native (float32) encoder — "
        "use io.wav.write_wav",
}


def _err(path: str, what: str, rc: int) -> ValueError:
    return ValueError(
        f"{path}: WAV {what} failed ({rc}: {_ERRORS.get(rc, 'unknown error')})")


def probe(path: str) -> WavInfo:
    info = WavInfo()
    rc = lib().asp_wav_probe(path.encode(), ctypes.byref(info))
    if rc:
        raise _err(path, "probe", rc)
    return info


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Native decode -> (planar float32 (channels, frames), rate)."""
    info = probe(path)
    out = np.empty((info.num_channels, info.num_frames), dtype=np.float32)
    got = lib().asp_wav_read(path.encode(), _fp(out), info.num_frames)
    if got < 0:
        raise _err(path, "read", got)
    return out[:, :got], info.sample_rate


def write_wav(path: str, x: np.ndarray, rate: int, bits: int = 16,
              float_fmt: bool = False) -> None:
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float32))
    if x.ndim == 1:
        x = x[None, :]
    rc = lib().asp_wav_write(path.encode(), _fp(x), x.shape[0], x.shape[1],
                             rate, bits, int(float_fmt))
    if rc:
        raise _err(path, "write", rc)


class WavReader:
    """Sequential native block decoder (asp_wav_open/read_block): the
    decode side of the ring-buffer streaming path — pulls fixed planar
    float32 blocks without loading the file (BASELINE.json:11)."""

    def __init__(self, path: str):
        self._h = lib().asp_wav_open(path.encode())
        if not self._h:
            raise ValueError(f"{path}: WAV open failed")
        info = WavInfo()
        lib().asp_wav_reader_info(self._h, ctypes.byref(info))
        self.rate = info.sample_rate
        self.channels = info.num_channels
        self.num_frames = info.num_frames

    def read_block(self, frames: int) -> np.ndarray:
        """Next (channels, <=frames) planar block; empty at EOF."""
        out = np.empty((self.channels, frames), dtype=np.float32)
        got = lib().asp_wav_read_block(self._h, _fp(out), frames)
        if got < 0:
            raise ValueError(f"WAV block read failed ({got})")
        return out[:, :got]

    def close(self):
        if getattr(self, "_h", None):
            lib().asp_wav_reader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class RingBuffer:
    """SPSC float32 planar ring buffer (native)."""

    def __init__(self, channels: int, capacity: int):
        self.channels = channels
        self.capacity = capacity
        self._h = lib().asp_ring_create(channels, capacity)

    def __del__(self):
        try:
            lib().asp_ring_destroy(self._h)
        except Exception:
            pass

    @property
    def writable(self) -> int:
        return lib().asp_ring_writable(self._h)

    @property
    def readable(self) -> int:
        return lib().asp_ring_readable(self._h)

    def push(self, x: np.ndarray) -> int:
        x = np.ascontiguousarray(x, dtype=np.float32)
        check(x.shape[0] == self.channels, 'guard failed: x.shape[0] == self.channels')
        return lib().asp_ring_push(self._h, _fp(x), x.shape[1])

    def pop(self, frames: int, pad: bool = True) -> tuple[np.ndarray, int]:
        out = np.empty((self.channels, frames), dtype=np.float32)
        got = lib().asp_ring_pop(self._h, _fp(out), frames, int(pad))
        return out, got
