"""Fused overlap-save Pallas kernel: the speed-of-light FIR path.

One kernel does, per grid step, entirely in VMEM:
    DMA input span (nb blocks + T-1 halo)  ->  slice into overlapping
    nfft-blocks  ->  packed rfft (four-step MXU)  ->  spectrum x H  ->
    packed irfft  ->  discard first T-1 per block  ->  write valid samples.

HBM traffic = read N(1 + (T-1)/(nb*B)) + write N — within a few percent of
the 2N speed-of-light bound, vs ~6N for the unfused rfft/mul/irfft
pipeline (blocks materialized + complex spectra round-tripped).
Semantics identical to ops.overlap_save.overlap_save (oracle-pinned causal
FIR, output length == input length).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.kernels.fft_kernel import (
    _pack_tables, _split_n, _tables_fourstep, irfft_planar_val, rfft_planar_val,
)


def _interpret() -> bool:
    return os.environ.get("ASP_INTERPRET_PALLAS", "0") == "1" or (
        jax.default_backend() != "tpu"
    )


def _os_kernel(nfft, t, b, nb, nt, n1, n2,
               x_hbm, f1c, f1s, f2c, f2s, twc, tws, wfc, wfs, hfr, hfi,
               o_ref, win, sem):
    """Grid (batch_tiles, span_tiles); win: (2, tb, nb*b + t - 1)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span = nb * b
    wlen = span + t - 1

    def fetch(slot, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tb, tb), pl.ds(jj * span, wlen)],
            win.at[slot],
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
    w = win[slot]
    # overlapping blocks: block q = w[:, q*b : q*b + nfft]
    blocks = jnp.stack([w[:, q * b : q * b + nfft] for q in range(nb)], axis=1)
    sr, si = rfft_planar_val(blocks, n1, n2,
                             f1c[:], f1s[:], f2c[:], f2s[:], twc[:], tws[:],
                             wfc[:], wfs[:])
    hr, hi = hfr[:], hfi[:]
    pr = sr * hr - si * hi
    pi_ = sr * hi + si * hr
    y = irfft_planar_val(pr, pi_, n1, n2,
                         f1c[:], -f1s[:], f2c[:], -f2s[:], twc[:], -tws[:],
                         wfc[:], wfs[:])
    o_ref[:] = y[:, :, t - 1 :].reshape(tb, span)


def overlap_save_fused(
    x: jnp.ndarray,
    h,
    nfft: int,
    history: jnp.ndarray | None = None,
    blocks_per_step: int = 8,
    batch_tile: int = 8,
) -> jnp.ndarray:
    """Causal FIR via the fused Pallas overlap-save kernel.

    Drop-in for ops.overlap_save.overlap_save (same oracle-pinned
    semantics).  f32/f64; nfft must be a power of two >= 8.
    """
    x = jnp.asarray(x)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    assert nfft > t - 1 and nfft & (nfft - 1) == 0 and nfft >= 8
    b = nfft - (t - 1)
    batch = x.shape[:-1]
    n = x.shape[-1]
    xf = x.reshape((-1, n))
    bsz = xf.shape[0]
    half = nfft // 2
    n1, n2 = _split_n(half)
    dt = x.dtype

    nb = int(blocks_per_step)
    nblocks = -(-n // b)
    nt = -(-nblocks // nb)
    span = nb * b
    total = nt * span
    if history is None:
        head = jnp.zeros((bsz, t - 1), dt)
    else:
        head = jnp.asarray(history).reshape((bsz, t - 1)).astype(dt)
    xp = jnp.concatenate(
        [head, xf, jnp.zeros((bsz, total - n), dt)], axis=-1
    )
    tb = int(min(batch_tile, bsz))
    bp = -(-bsz // tb) * tb
    if bp != bsz:
        xp = jnp.pad(xp, ((0, bp - bsz), (0, 0)))

    f1c_, f1s_, f2c_, f2s_, twc_, tws_ = _tables_fourstep(half, -1.0)
    wfc_, wfs_ = _pack_tables(nfft)
    hf = np.fft.rfft(np.concatenate([h, np.zeros(nfft - t)]))
    consts = [jnp.asarray(a, dt) for a in
              (f1c_, f1s_, f2c_, f2s_, twc_, tws_, wfc_, wfs_, hf.real, hf.imag)]

    bs_c = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_os_kernel, nfft, t, b, nb, nt, n1, n2),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [bs_c(c.shape) for c in consts],
        out_specs=pl.BlockSpec((tb, span), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, total), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tb, span + t - 1), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
    )(xp, *consts)
    return y[:bsz, :n].reshape(batch + (n,))
