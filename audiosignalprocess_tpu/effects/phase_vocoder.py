"""Phase-vocoder pitch/time processing (SURVEY.md §2 row 14), oracle-pinned.

Time stretch: output frame i samples analysis position t_i = i*rate
(frames), linearly interpolating magnitude and accumulating the
deviation-corrected instantaneous frequency.  The phase accumulation is a
prefix sum — implemented as a ``jnp.cumsum`` over frames (no sequential
scan), so the whole vocoder is dense batched tensor work on TPU.

Pitch shift = time stretch by 1/factor + polyphase resample by the
rational approximation of the factor.
"""

from __future__ import annotations

from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.resample import resample_poly
from audiosignalprocess_tpu.ops.stft import istft, num_frames, stft


def _wrap(p: jnp.ndarray) -> jnp.ndarray:
    return p - 2.0 * jnp.pi * jnp.round(p / (2.0 * jnp.pi))


def stretch_spec(spec: jnp.ndarray, rate: float, nfft: int, hop: int) -> jnp.ndarray:
    """Resample an STFT along frames with phase accumulation (vectorized)."""
    nf = spec.shape[-2]
    nbins = spec.shape[-1]
    steps = np.arange(0, nf - 1, rate)  # static
    k = np.floor(steps).astype(np.int64)
    frac = jnp.asarray(steps - k, jnp.real(spec).dtype)[..., :, None]
    omega = jnp.asarray(
        2.0 * np.pi * np.arange(nbins) * hop / nfft, jnp.real(spec).dtype
    )
    s0 = jnp.take(spec, jnp.asarray(k), axis=-2)
    s1 = jnp.take(spec, jnp.asarray(k + 1), axis=-2)
    mag = (1.0 - frac) * jnp.abs(s0) + frac * jnp.abs(s1)
    dphi = _wrap(jnp.angle(s1) - jnp.angle(s0) - omega) + omega
    # phase_i = angle(spec[0]) + sum_{j<i} dphi_j  (prefix sum over frames)
    phase0 = jnp.angle(spec[..., 0:1, :])
    acc = jnp.cumsum(dphi, axis=-2)
    phase = phase0 + jnp.concatenate(
        [jnp.zeros_like(acc[..., :1, :]), acc[..., :-1, :]], axis=-2
    )
    return (mag * jnp.exp(1j * phase)).astype(spec.dtype)


def time_stretch(
    x: jnp.ndarray,
    rate: float,
    nfft: int = 1024,
    hop: int = 256,
    window_kind: str = "hann",
    impl: str = fft_ops.DEFAULT_IMPL,
) -> jnp.ndarray:
    """Phase-vocoder time stretch (rate > 1 speeds up)."""
    spec = stft(x, nfft, hop, window_kind, impl=impl)
    out = stretch_spec(spec, rate, nfft, hop)
    return istft(out, nfft, hop, window_kind, impl=impl)


def pitch_shift(
    x: jnp.ndarray,
    semitones: float,
    nfft: int = 1024,
    hop: int = 256,
    window_kind: str = "hann",
    resample_quant: int = 128,
    impl: str = fft_ops.DEFAULT_IMPL,
) -> jnp.ndarray:
    """Pitch shift by semitones; output has ~the input duration."""
    factor = 2.0 ** (semitones / 12.0)
    fr = Fraction(factor).limit_denominator(resample_quant)
    up, down = fr.denominator, fr.numerator
    y = time_stretch(x, 1.0 / factor, nfft, hop, window_kind, impl=impl)
    return resample_poly(y, up, down)


def output_frames(n: int, rate: float, nfft: int, hop: int) -> int:
    """Static output frame count of stretch_spec for input length n."""
    nf = num_frames(n, nfft, hop)
    return len(np.arange(0, nf - 1, rate))
