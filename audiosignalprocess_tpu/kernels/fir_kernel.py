"""Pallas FIR MAC kernel (SURVEY.md §2 row 7; BASELINE.json:5 mandates
Pallas for the FIR/polyphase MAC inner loops).

Causal direct-form FIR: y[n] = sum_t h[t] x[n-t].  Each grid step produces
a (batch_tile, time_tile) output block; its input window is the block plus
a left halo of T-1 samples.  Overlapping windows cannot be expressed with
blocked BlockSpecs (index maps address whole blocks), so the input stays
in HBM (``memory_space=ANY``) and the kernel DMAs the exact
element-addressed window into a VMEM scratch, double-buffered across the
time grid so the next window's fetch overlaps the current MAC loop.

The MAC loop is a static Python loop over taps — one fused VPU
multiply-add per tap over the whole tile, the TPU analog of the C inner
loop.  Intended for short/medium filters; long filters route through the
overlap-save FFT kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.kernels.fft_kernel import (
    _interpret, check_kernel_dtype, vmem_tile_cap)


def _fir_kernel(t, tile, nt, pref, x_hbm, h_ref, o_ref, xwin, sem):
    """Grid (batch_tiles, time_tiles); xwin: (2, tb, tile+pref) double buffer.
    ``pref`` = roundup(t-1, 128): the DMA window is lane-aligned; the tap
    shift offsets inside VMEM are free-form (lane rotates)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]

    def fetch(slot, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tb, tb), pl.ds(jj * tile, tile + pref)],
            xwin.at[slot],
            sem.at[slot],
        )

    @pl.when(j == 0)
    def _():
        fetch(0, 0).start()

    slot = j % 2

    @pl.when(j + 1 < nt)
    def _():
        fetch((j + 1) % 2, j + 1).start()

    fetch(slot, j).wait()
    x = xwin[slot]
    acc = h_ref[0, 0] * x[:, pref : pref + tile]
    for k in range(1, t):
        acc = acc + h_ref[0, k] * x[:, pref - k : pref - k + tile]
    o_ref[:] = acc


def fir_mac(x: jnp.ndarray, h, history: jnp.ndarray | None = None,
            time_tile: int = 2048, batch_tile: int = 8) -> jnp.ndarray:
    """Causal direct-form FIR on the last axis via the Pallas MAC kernel.

    Same semantics as ops.fir.fir_direct: output length == len(x);
    ``history`` is the previous T-1 samples (zeros when absent).
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    batch = x.shape[:-1]
    n = x.shape[-1]
    xf = x.reshape((-1, n))
    b = xf.shape[0]
    if history is None:
        head = jnp.zeros((b, t - 1), x.dtype)
    else:
        # explicit batch dim: reshape((-1, 0)) for a single-tap filter
        # would divide by the zero trailing dim
        head = jnp.asarray(history).reshape((b, t - 1)).astype(x.dtype)
    tile = int(min(time_tile, max(128, n)))
    tile = -(-tile // 128) * 128  # Mosaic: last out dim % 128 == 0
    pref = -(-(t - 1) // 128) * 128  # lane-aligned DMA window prefix
    npad = -(-n // tile) * tile
    # VMEM-aware batch tile: double-buffered (tile+pref) DMA window plus
    # ~4 live MAC accumulation planes per step
    tb = int(min(batch_tile, b,
                 vmem_tile_cap(6, tile + pref, x.dtype.itemsize)))
    bp = -(-b // tb) * tb
    xp = jnp.concatenate([
        jnp.zeros((b, pref - (t - 1)), x.dtype), head, xf,
        jnp.zeros((b, npad - n), x.dtype),
    ], axis=-1)
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0)))
    hrow = jnp.asarray(h, x.dtype).reshape(1, t)
    nt = npad // tile
    grid = (bp // tb, nt)
    y = pl.pallas_call(
        functools.partial(_fir_kernel, t, tile, nt, pref),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, t), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, npad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tb, tile + pref), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp, hrow)
    return y[:b, :n].reshape(batch + (n,))
