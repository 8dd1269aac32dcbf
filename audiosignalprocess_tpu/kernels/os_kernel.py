"""Fused overlap-save Pallas kernel: the speed-of-light FIR path.

One kernel does, per grid step, entirely in VMEM:
    DMA input span (nb blocks + FFT halo)  ->  slice into overlapping
    nfft-blocks  ->  four-step MXU FFT  ->  spectrum x H  ->  inverse
    four-step  ->  emit the b new valid samples per block.

Mosaic cannot reshape the lane (minor) dimension, so the kernel works
entirely in "row space": the input is pre-reshaped in XLA to
(batch, rows, n2) — n2 the four-step lane width — and every in-kernel
slice/stack is on sublane (row) axes.  The block hop b and the emission
offset e0 are row-aligned; the extra overlap this forces costs a few
percent of FFT compute, which is free (the kernel is HBM-bound: traffic
= read N(1 + (nfft-b)/(nb*b)) + write N, vs ~6N for the unfused
rfft/mul/irfft pipeline).

Semantics identical to ops.overlap_save.overlap_save (oracle-pinned
causal FIR, output length == input length).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.kernels.fft_kernel import (
    check_kernel_dtype,
    _interpret,
    _grid_split, fourstep_grid_fwd, fourstep_grid_inv_real, grid_table_arrays,
    tap_spectrum_grid,
    vmem_tile_cap,
    hbm_fetch_rows,
)
from audiosignalprocess_tpu.utils.validate import check




def _os_kernel(br, e0r, padr, nb, nt, n1, n2,
               x_hbm, c1, s1, c2, s2, tbc, tbs, hgr, hgi,
               o_ref, win, sem):
    """Grid (batch_tiles, span_tiles); win: (2, tb, wrows, n2) row-space."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = nb * br
    wrows = win.shape[2]  # span_r + (n1-br) rounded for HBM DMA alignment

    def fetch(slot, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tb, tb), pl.ds(jj * span_r, wrows), :],
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
    w3 = win[slot]  # (tb, wrows, n2)
    # overlapping blocks: block q = rows [q*br, q*br + n1) — sublane slices
    blocks = jnp.stack([w3[:, q * br : q * br + n1, :] for q in range(nb)],
                       axis=1)  # (tb, nb, n1, n2) == the four-step [a, b] grid
    sr, si = fourstep_grid_fwd(blocks, None, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    hr, hi = hgr[:], hgi[:]  # taps spectrum pre-arranged in grid layout
    pr = sr * hr - si * hi
    pi_ = sr * hi + si * hr
    y = fourstep_grid_inv_real(pr, pi_, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    # emit rows [e0r - padr, e0r + br): the b valid new samples per block,
    # left-padded with padr discard rows so the sublane slice offset is
    # 8-aligned (same Mosaic crash class / fix as gate_kernel.
    # carry_tail_rows; the pad rows are dropped in XLA after the call)
    o_ref[:] = y[:, :, e0r - padr : e0r + br, :]


def overlap_save_fused(
    x: jnp.ndarray,
    h,
    nfft: int,
    history: jnp.ndarray | None = None,
    blocks_per_step: int = 8,
    batch_tile: int = 32,
) -> jnp.ndarray:
    """Causal FIR via the fused Pallas overlap-save kernel.

    Drop-in for ops.overlap_save.overlap_save (same oracle-pinned
    semantics).  f32/f64; nfft a power of two with nfft - roundup(T-1)
    >= one grid row (n2).
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    check(nfft > t - 1 and nfft & (nfft - 1) == 0, 'guard failed: nfft > t - 1 and nfft & (nfft - 1) == 0')
    n1, n2 = _grid_split(nfft)
    # row-aligned emission offset and block hop
    e0 = -(-(t - 1) // n2) * n2
    b = ((nfft - e0) // n2) * n2
    check(b >= n2, f"nfft={nfft} too small for {t} taps with row width {n2}")
    br, e0r = b // n2, e0 // n2
    # Mosaic lowering crash class (docs/KERNELS.md constraint 7): a
    # sublane slice of an in-kernel value at an 8-unaligned row offset
    # with < 3 rows SIGABRTs in lower-to-LLO.  Repair instead of reject:
    # emit from the aligned-down offset with padr extra discard rows
    # (the carry_tail_rows zero-pad trick), dropped in XLA below.
    padr = e0r % 8 if br < 3 else 0
    batch = x.shape[:-1]
    n = x.shape[-1]
    xf = x.reshape((-1, n))
    bsz = xf.shape[0]
    dt = x.dtype

    nb = int(blocks_per_step)
    if n2 > 128:
        # HBM DMA slice starts (j * nb * br rows) must be 8-aligned for
        # lane dims beyond the 128 base tile (see hbm_fetch_rows)
        a = 8 // math.gcd(br, 8)
        nb = -(-nb // a) * a
    nblocks = -(-n // b)
    nt = -(-nblocks // nb)
    span = nb * b
    total = nt * span
    wfetch = hbm_fetch_rows(nb * br + (n1 - br), n2)
    if history is None:
        hist = jnp.zeros((bsz, t - 1), dt)
    else:
        hist = jnp.asarray(history).reshape((bsz, t - 1)).astype(dt)
    # prefix = e0 samples: (e0 - (t-1)) zeros then the true history
    pre = jnp.zeros((bsz, e0 - (t - 1)), dt)
    # right-pad so the final span's (row-aligned) DMA window is in bounds:
    # xp already holds e0 + n samples (prefix + signal)
    rpad = (nt - 1) * span + wfetch * n2 - n - e0
    xp = jnp.concatenate(
        [pre, hist, xf, jnp.zeros((bsz, max(0, rpad)), dt)], axis=-1
    )
    # VMEM-aware batch tile: the step holds ~10 live (tb, nb, n1, n2)
    # planes (window scratch x2 + four-step intermediates); cap the tile
    # so big-nfft configs (16384-pt config 4) fit VMEM (ASP_VMEM_MB)
    tb = int(min(batch_tile, bsz,
                 vmem_tile_cap(10, nb * nfft, x.dtype.itemsize)))
    bp = -(-bsz // tb) * tb
    if bp != bsz:
        xp = jnp.pad(xp, ((0, bp - bsz), (0, 0)))
    # flat -> row space in XLA (free)
    nrows = xp.shape[-1] // n2
    xp3 = xp[:, : nrows * n2].reshape(bp, nrows, n2)

    consts = grid_table_arrays(nfft, dt, (n1, n2)) + tap_spectrum_grid(
        h, nfft, n1, n2, dt)

    bs_c = lambda shape: pl.BlockSpec(
        shape, (lambda i, j: (0,) * len(shape)), memory_space=pltpu.VMEM)
    # 4D output (batch, block, row, n2): last two dims equal the array's,
    # so Mosaic's (8, 128) divisibility rule is satisfied for any shape.
    orow = br + padr
    y = pl.pallas_call(
        functools.partial(_os_kernel, br, e0r, padr, nb, nt, n1, n2),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [bs_c(c.shape) for c in consts],
        out_specs=pl.BlockSpec((tb, nb, orow, n2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, nt * nb, orow, n2), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tb, wfetch, n2), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp3, *consts)
    if padr:
        y = y[:, :, padr:, :]
    return y.reshape(bp, total)[:bsz, :n].reshape(batch + (n,))
