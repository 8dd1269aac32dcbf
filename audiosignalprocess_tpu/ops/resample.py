"""Polyphase rational resampler (SURVEY.md §2 row 9), e.g. 44.1->48 kHz = 160/147.

Convention pinned by cpu_ref/oracle.resample_poly: causal polyphase
y[j] = sum_k h[p_j + up*k] * x[m_j - k] with j*down = m_j*up + p_j;
``zero_phase=True`` advances by the filter group delay.  Output length
= ceil(len(x)*up/down).

TPU design: the whole resampler is ONE ``lax.conv_general_dilated`` call —
``lhs_dilation=up`` realizes the zero-stuffed upsampling, ``window_strides
=down`` the decimation, reversed taps the causal convolution.  XLA lowers
this onto the MXU; the Pallas polyphase-MAC kernel
(kernels/resample_kernel.py) is the hand-tuned path behind the same
semantics.
"""

from __future__ import annotations

from math import gcd

import jax.numpy as jnp
import numpy as np
from jax import lax

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.utils.validate import check

resample_filter = oracle.resample_filter


def taps_per_phase(h_len: int, up: int) -> int:
    """nk = ceil(len(h)/up): polyphase taps per phase."""
    return -(-h_len // up)


def history_len(h_len: int, up: int, down: int) -> int:
    """Streaming history: >= nk-1 input samples, rounded up to a multiple
    of ``down`` so the block output count stays integral."""
    nk = taps_per_phase(h_len, up)
    return -(-(nk - 1) // down) * down


def resample_poly(
    x: jnp.ndarray,
    up: int,
    down: int,
    h=None,
    zero_phase: bool = True,
    history: jnp.ndarray | None = None,
    fused: bool = False,
) -> jnp.ndarray:
    """Rational resample on the last axis.  Output ceil(n*up/down) samples.

    ``history``: optional (..., H) previous input samples for streaming
    (requires zero_phase=False, H a multiple of ``down``, and
    len(x) a multiple of ``down``); returns the len(x)*up/down outputs of
    the new block, continuing the global causal stream exactly.
    ``fused=True`` routes through the Pallas phase-matrix MXU kernel
    (kernels/resample_kernel.resample_mac, same semantics).
    """
    if fused:
        from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac

        return resample_mac(x, up, down, h=h, zero_phase=zero_phase,
                            history=history)
    g = gcd(up, down)
    up, down = up // g, down // g
    x = jnp.asarray(x)
    if up == 1 and down == 1:
        return x
    if h is None:
        h = resample_filter(up, down)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    batch = x.shape[:-1]

    if history is not None:
        check(not zero_phase, "streaming resample must be causal")
        hist = jnp.asarray(history).astype(x.dtype)
        hn = hist.shape[-1]
        check(hn % down == 0 and x.shape[-1] % down == 0, 'guard failed: hn % down == 0 and x.shape[-1] % down == 0')
        check(hn >= taps_per_phase(t, up) - 1, f"history {hn} shorter than the filter needs "
            f"({taps_per_phase(t, up) - 1}); use history_len()")
        skip = hn * up // down
        nout = x.shape[-1] * up // down
        x = jnp.concatenate([hist, x], axis=-1)
    else:
        skip = 0
        nout = -(-x.shape[-1] * up // down)

    n = x.shape[-1]
    delay = (t - 1) // 2 if zero_phase else 0
    ld = (n - 1) * up + 1  # zero-stuffed length
    pad_lo = t - 1 - delay
    total_out = skip + nout
    pad_hi = max(0, (total_out - 1) * down + t - ld - pad_lo)

    xf = x.reshape((-1, 1, n))
    rhs = jnp.asarray(h[::-1].copy(), x.dtype).reshape((1, 1, t))
    y = lax.conv_general_dilated(
        xf,
        rhs,
        window_strides=(down,),
        padding=[(pad_lo, pad_hi)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=lax.Precision.HIGHEST,
    )
    y = y.reshape(batch + (y.shape[-1],))
    return y[..., skip : skip + nout]
