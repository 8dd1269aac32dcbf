"""Pallas polyphase-resampler MAC kernel (SURVEY.md §2 row 9;
BASELINE.json:5 mandates Pallas for the polyphase MAC inner loops).

TPU-native formulation: instead of the C per-phase scalar MAC loop, the
rational resampler is restructured as ONE dense matmul per output tile —
a zero-gather mapping onto the MXU:

With g=gcd reduced (up, down), output j = up*t + s (t = cycle, s = slot):
    y[up*t + s] = sum_k h[p_s + up*k] * x[down*t + c_s - k]
where c_s = (s*down + delay) // up, p_s = (s*down + delay) mod up.
All input samples touched by cycle t lie in a window of R*down
consecutive samples starting at down*t + base (base, R static).  XLA
builds V[t] = that window from the down-aligned row view (pure
reshape+slice+concat — no gathers; Mosaic cannot lane-reshape, so this
layout prep stays OUTSIDE the kernel), and a static phase matrix M[s, o]
with M[s, (c_s - k) - base] = h[p_s + up*k].  The kernel is then a clean
tiled MXU matmul over standard blocked specs:

    Y[t, s] = sum_o V[t, o] * M[o, s]

The matmul does R*down/nk more FLOPs than the scalar MAC loop, but the
MXU has orders of magnitude of FLOP headroom and the op stays
bandwidth-bound — the classic TPU trade: dense regular compute beats
sparse gather.
"""

from __future__ import annotations

import functools
from math import gcd

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.fft_kernel import (
    _interpret, check_kernel_dtype, vmem_tile_cap)
from audiosignalprocess_tpu.utils.validate import check




@functools.lru_cache(maxsize=32)  # keys hold full tap tuples: bound them
def _phase_matrix(h_key, up: int, down: int, delay: int):
    """Static (M, base, R): M (up, R*down) float64; window = x[down*t + base + i]."""
    h = np.asarray(h_key, dtype=np.float64)
    t = len(h)
    nk = -(-t // up)
    s = np.arange(up)
    c = (s * down + delay) // up
    p = (s * down + delay) % up
    omin = int(c.min()) - (nk - 1)
    omax = int(c.max())
    base = (omin // down) * down  # floor-align (handles negative omin)
    r = -(-(omax - base + 1) // down)
    m = np.zeros((up, r * down))
    for si in range(up):
        for k in range(nk):
            tap = p[si] + up * k
            if tap < t:
                m[si, (c[si] - k) - base] = h[tap]
    return m, base, r


def _resample_kernel(v_ref, m_ref, o_ref):
    """Pure MXU matmul: V (tb, tcyc, W) . M (W, up) -> (tb, tcyc, up)."""
    o_ref[:] = jax.lax.dot_general(
        v_ref[:], m_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=o_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


def resample_mac(
    x: jnp.ndarray,
    up: int,
    down: int,
    h=None,
    zero_phase: bool = True,
    history: jnp.ndarray | None = None,
    cycle_tile: int = 128,
    batch_tile: int = 8,
) -> jnp.ndarray:
    """Rational resample via the Pallas phase-matrix kernel.

    Same semantics as ops.resample.resample_poly (output ceil(n*up/down);
    ``history`` for causal streaming continuation).
    """
    g = gcd(up, down)
    up, down = up // g, down // g
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    if up == 1 and down == 1:
        return x
    if h is None:
        h = oracle.resample_filter(up, down)
    h = np.asarray(h, dtype=np.float64)
    batch = x.shape[:-1]
    xf = x.reshape((-1, x.shape[-1]))
    b = xf.shape[0]

    if history is not None:
        check(not zero_phase, "streaming resample must be causal")
        hist = jnp.asarray(history).reshape((b, -1)).astype(x.dtype)
        hn = hist.shape[-1]
        check(hn % down == 0 and x.shape[-1] % down == 0, 'guard failed: hn % down == 0 and x.shape[-1] % down == 0')
        nk = -(-len(h) // up)
        check(hn >= nk - 1, f"history {hn} shorter than the filter needs ({nk - 1}); "
            f"use ops.resample.history_len()")
        skip = hn * up // down
        nout = x.shape[-1] * up // down
        xf = jnp.concatenate([hist, xf], axis=-1)
    else:
        skip = 0
        nout = -(-x.shape[-1] * up // down)

    n = xf.shape[-1]
    delay = (len(h) - 1) // 2 if zero_phase else 0
    m_np, base, r = _phase_matrix(tuple(h.tolist()), up, down, delay)
    w = r * down

    ncyc = -(-(skip + nout) // up)  # total output cycles
    tcyc = int(min(cycle_tile, max(8, ncyc)))
    tcyc = -(-tcyc // 8) * 8  # Mosaic: 2nd-to-last out dim % 8 == 0
    ncp = -(-ncyc // tcyc) * tcyc  # padded cycles
    # window for cycle t: xp_idx = down*t + i, i < r*down, xp_idx 0 == x
    # index base  ->  left pad = -base (when base < 0)
    lpad = max(0, -base)
    shift = base + lpad  # >= 0: samples of x to skip at xp start
    nrows = ncp + r  # row t covers xp[down*t : down*(t+1))
    need = nrows * down
    rpad = max(0, need + shift - lpad - n)
    xp = jnp.concatenate(
        [jnp.zeros((b, lpad), x.dtype), xf, jnp.zeros((b, rpad), x.dtype)], axis=-1
    )
    if shift:
        xp = xp[:, shift:]
    # lane-padded window width (shared by the VMEM model, the V padding,
    # and the BlockSpecs — one variable so they cannot disagree)
    wp = -(-w // 128) * 128
    # VMEM-aware batch tile: ~6 live (tb, tcyc, wp|up) planes per step
    # (phase window, hi/lo splits, products, out)
    tb = int(min(batch_tile, b,
                 vmem_tile_cap(6, tcyc * max(wp, up), x.dtype.itemsize)))
    bp = -(-b // tb) * tb
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0)))
    # XLA-side V build: down-aligned rows, R shifted row views concatenated
    # on the last axis (layout prep the kernel cannot do itself).  Pad the
    # window width to a lane multiple for clean MXU tiling.
    x3 = xp[:, : nrows * down].reshape(bp, nrows, down)
    v = jnp.concatenate([x3[:, q : q + ncp, :] for q in range(r)], axis=-1)
    if wp != w:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, wp - w)))
    m_pad = np.zeros((wp, up))
    m_pad[:w] = m_np.T
    m = jnp.asarray(m_pad, x.dtype)

    grid = (bp // tb, ncp // tcyc)
    y = pl.pallas_call(
        _resample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, tcyc, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, up), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tcyc, up), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ncp, up), x.dtype),
        interpret=_interpret(),
    )(v, m)
    y = y.reshape(bp, ncp * up)
    return y[:b, skip : skip + nout].reshape(batch + (nout,))
