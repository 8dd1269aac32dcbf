"""Fused spectral noise-gate Pallas kernel: STFT -> mask -> WOLA ISTFT in
one VMEM-resident pass (SURVEY.md §2 row 13, the hot loop of configs 3/5).

Per grid step (batch tile x frame tile): DMA the input span (mf frames +
nfft-hop halo), window+FFT every frame (four-step MXU, grid layout),
apply the per-bin noise-floor mask, inverse FFT, window, overlap-add.
The OLA spill across frame-tile boundaries rides a VMEM scratch carried
between grid steps — TPU grid execution is sequential, so the carry is
exact: the streaming pipeline's carry trick, on-chip.

Mosaic cannot reshape the lane dimension, so everything runs in "row
space": the input is pre-reshaped in XLA to (batch, rows, n2) and all
in-kernel slicing/stacking/OLA is on sublane (row) axes; the spectrum
lives in the four-step (n1, n2) grid layout, with the noise floor and
WOLA 1/norm tables pre-arranged to match.

HBM traffic ~ (1 + d/(mf*hop)) N read + N write, vs ~10-20 N for the
unfused stft/mask/istft pipeline (spectra round-tripped through HBM).
The noise floor (mean |STFT| of the first noise_frames frames) is a tiny
XLA prologue.  Output == effects.noise_gate (oracle-pinned).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.fft_kernel import (
    check_kernel_dtype,
    _interpret,
    _grid_split, fourstep_grid_fwd, fourstep_grid_inv_real, grid_table_arrays,
)
from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.stft import frame as frame_op
from audiosignalprocess_tpu.utils.validate import check




def floor_grid(frames_windowed, n1, n2, dtype):
    """Per-channel noise-floor in the kernel's (n1, n2) grid layout from
    pre-windowed prologue frames (shared by the gate and chain kernels)."""
    nfft = n1 * n2
    floor_half = jnp.mean(jnp.abs(fft_ops.rfft(frames_windowed, impl="matmul")),
                          axis=-2).astype(dtype)
    # mirror to the full spectrum (real input: |S[k]| == |S[n-k]|), then
    # rearrange to G[c, d] = floor[n1*d + c]
    mirror = np.minimum(np.arange(nfft), nfft - np.arange(nfft))
    floor_full = jnp.take(floor_half, jnp.asarray(mirror), axis=-1)
    return jnp.transpose(floor_full.reshape(-1, n2, n1), (0, 2, 1))


def inv_norm_rows(wv_np, nfft, hop, nframes, total_len):
    """Full-length 1/WOLA-norm vector over the padded output: head ramp,
    interior constant, tail ramp, then 1.0 in the zero padding."""
    out_len = nfft + (nframes - 1) * hop
    w2 = wv_np ** 2
    norm_np = np.zeros(total_len)
    for k in range(nframes):
        norm_np[k * hop : k * hop + nfft] += w2
    inv = 1.0 / np.maximum(norm_np, 1e-12)
    inv[out_len:] = 1.0
    return inv


def ola_rows(y, spill, mf, hr, dr, n2):
    """Row-space overlap-add of mf frames with a cross-step spill carry.

    y: (tb, mf, nr, n2) windowed time frames; spill: (tb, dr, n2) VMEM
    scratch REF.  Built as a sum of zero-padded shifts (lane-reshape-free,
    scatter-free).  Returns the (tb, mf*hr, n2) emitted rows; updates
    ``spill`` in place.
    """
    tb = y.shape[0]
    nr = y.shape[2]
    r = nr // hr
    span_r = mf * hr
    zfr = lambda k: jnp.zeros((tb, k, hr, n2), y.dtype)
    acc4 = None
    for q in range(r):
        piece = y[:, :, q * hr : (q + 1) * hr, :]  # (tb, mf, hr, n2)
        if q > 0:
            piece = jnp.concatenate([zfr(q), piece], axis=1)
        if r - 1 - q > 0:
            piece = jnp.concatenate([piece, zfr(r - 1 - q)], axis=1)
        acc4 = piece if acc4 is None else acc4 + piece
    # merge (frame, hop-row) -> row axis: concat over the frame axis
    acc = jnp.concatenate([acc4[:, f] for f in range(mf + r - 1)], axis=1)
    acc = acc[:, : span_r + dr]
    acc = jnp.concatenate([acc[:, :dr] + spill[:], acc[:, dr:]], axis=1)
    spill[:] = acc[:, span_r:]
    return acc[:, :span_r]


def _gate_kernel(hr, nr, dr, mf, nt, n1, n2, thresh_gain, att, nframes,
                 release,
                 x_hbm, floor_ref, wgrid, inv_norm,
                 c1, s1, c2, s2, tbc, tbs,
                 o_ref, win, spill, rel, sem):
    """Grid (batch_tiles, frame_tiles); row space (rows of n2 samples):
    hr = hop rows, nr = nfft rows (== n1), dr = (nfft-hop) rows."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = mf * hr
    wrows = span_r + dr

    def fetch(slot, jj):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tb, tb), pl.ds(jj * span_r, wrows), :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(j == 0)
    def _():
        fetch(0, 0).start()
        spill[:] = jnp.zeros_like(spill)
        if release > 0.0:
            rel[:] = jnp.zeros_like(rel)

    slot = j % 2

    @pl.when(j + 1 < nt)
    def _():
        fetch((j + 1) % 2, j + 1).start()

    fetch(slot, j).wait()
    w3 = win[slot]  # (tb, wrows, n2)
    wv = wgrid[:]   # (n1, n2) window in grid layout
    frames = jnp.stack([w3[:, q * hr : q * hr + nr, :] for q in range(mf)],
                       axis=1)  # (tb, mf, n1, n2) [a, b] grid
    sr, si = fourstep_grid_fwd(frames * wv, None, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    mag = jnp.sqrt(sr * sr + si * si)
    floor = floor_ref[:][:, None, :, :]  # (tb, 1, n1, n2) grid floor
    mask = jnp.where(mag > floor * thresh_gain, 1.0, att).astype(sr.dtype)
    if release > 0.0:
        # max-with-decay release smoothing s_q = max(mask_q, r*s_{q-1})
        # across ALL frames: sequential within the tile, carried across
        # grid steps in VMEM scratch (grid execution is sequential)
        state = rel[:]
        rows = []
        for q in range(mf):
            state = jnp.maximum(mask[:, q], release * state)
            rows.append(state)
        rel[:] = state
        mask = jnp.stack(rows, axis=1)
    y = fourstep_grid_inv_real(sr * mask, si * mask, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:]) * wv
    # frames past the last whole frame (oracle has no partial frames) are
    # padding that still overlaps real samples — zero their contributions
    fidx = j * mf + jax.lax.broadcasted_iota(jnp.int32, (1, mf, 1, 1), 1)
    y = y * (fidx < nframes).astype(y.dtype)
    # OLA + spill carry, then WOLA normalization (1/norm rows arrive
    # pre-sliced via a block-indexed input — no in-kernel gather)
    o_ref[:] = ola_rows(y, spill, mf, hr, dr, n2) * inv_norm[0]


def noise_gate_fused(
    x: jnp.ndarray,
    nfft: int = 1024,
    hop: int = 256,
    threshold_db: float = 6.0,
    reduction_db: float = 60.0,
    noise_frames: int = 8,
    release: float = 0.0,
    window_kind: str = "hann",
    frames_per_step: int = 8,
    batch_tile: int = 32,
) -> jnp.ndarray:
    """Fused-gate drop-in for effects.noise_gate (incl. release smoothing).

    Output length = nfft + (F-1)*hop, exactly the oracle convention.
    Requires hop % n2 == 0 (n2 = four-step lane width of nfft).
    """
    check(nfft % hop == 0, 'guard failed: nfft % hop == 0')
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    batch = x.shape[:-1]
    n = x.shape[-1]
    xf = x.reshape((-1, n))
    b = xf.shape[0]
    dt = x.dtype
    d = nfft - hop
    nframes = 1 + (n - nfft) // hop
    out_len = nfft + (nframes - 1) * hop
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, d // n2

    # prologue: per-channel noise floor from the first noise_frames frames
    wv_np = oracle.window(window_kind, nfft, periodic=True)
    pro = frame_op(xf[:, : d + noise_frames * hop], nfft, hop) * jnp.asarray(wv_np, dt)
    floor = floor_grid(pro, n1, n2, dt)

    check(nframes * hop >= 2 * d, "signal too short for the fused gate")
    mf = int(frames_per_step)
    # Mosaic: 2nd-to-last out-block dim (mf*hr) % 8 == 0
    align = max(1, -(-8 // hr))
    mf = -(-mf // align) * align
    # pad with >= r-1 zero frames so the final OLA tail lands inside the
    # (span-aligned) output array: total_f*hop >= F*hop + d
    nt = -(-(nframes + nfft // hop - 1) // mf)
    total_f = nt * mf
    # pad input so every padded frame exists (zero frames mask to zero)
    need = total_f * hop + d
    xp = jnp.concatenate([xf, jnp.zeros((b, max(0, need - n)), dt)], axis=-1)
    tb = int(min(batch_tile, b))
    bp = -(-b // tb) * tb
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0)))
        floor = jnp.pad(floor, ((0, bp - b), (0, 0), (0, 0)))
    # flat -> row space in XLA (free)
    nrows_in = xp.shape[-1] // n2
    xp3 = xp[:, : nrows_in * n2].reshape(bp, nrows_in, n2)

    inv_norm = jnp.asarray(
        inv_norm_rows(wv_np, nfft, hop, nframes, total_f * hop), dt
    ).reshape(1, total_f * hr, n2)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    tabs = grid_table_arrays(nfft, dt, (n1, n2))
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, j: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
    span_r = mf * hr
    y = pl.pallas_call(
        functools.partial(_gate_kernel, hr, nr, dr, mf, nt, n1, n2,
                          thresh_gain, att, nframes, float(release)),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((tb, n1, n2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  bs_c(wgrid),
                  pl.BlockSpec((1, span_r, n2), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM)]
        + [bs_c(t) for t in tabs],
        out_specs=pl.BlockSpec((tb, span_r, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, total_f * hr, n2), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tb, span_r + dr, n2), dt),
            pltpu.VMEM((tb, dr, n2), dt),
            pltpu.VMEM((tb, n1, n2), dt),  # release-smoothing state
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp3, floor, wgrid, inv_norm, *tabs)
    out = y.reshape(bp, total_f * hop)[:b, :out_len]
    return out.reshape(batch + (out_len,))
