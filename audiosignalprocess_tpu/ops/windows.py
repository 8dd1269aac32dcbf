"""Window functions (Hann/Hamming/Blackman/rect) for STFT and FIR design.

Conventions pinned by cpu_ref/oracle.py: ``periodic=True`` (DFT-even) for
STFT, symmetric for FIR design.  Windows are computed in float64 numpy at
trace time and embedded as constants — they are design-time data, not
device compute (SURVEY.md §2 row 2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from audiosignalprocess_tpu.cpu_ref import oracle

KINDS = ("rect", "hann", "hamming", "blackman")


def window(kind: str, n: int, periodic: bool = True, dtype=jnp.float32) -> jnp.ndarray:
    """Window of length n as a jnp constant (float64-accurate values)."""
    return jnp.asarray(oracle.window(kind, n, periodic=periodic), dtype=dtype)


def window_np(kind: str, n: int, periodic: bool = True) -> np.ndarray:
    """Float64 numpy window (design-time use)."""
    return oracle.window(kind, n, periodic=periodic)
