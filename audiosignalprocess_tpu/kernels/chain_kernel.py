"""Fully-fused FIR + spectral-noise-gate chain kernel.

The headline 48 kHz chain (BASELINE.json:2: overlap-save FIR -> STFT
noise gate) as ONE Pallas kernel: raw audio is read from HBM once, the
FIR runs as grid-FFT overlap-save on the in-VMEM window, the filtered
samples are re-framed for the gate, masked, overlap-added (spill carried
across grid steps in VMEM scratch), normalized, and written once.

Vs running the two fused kernels back to back this halves both the HBM
traffic (no filtered-signal round trip, no wrapper concat/slice copies)
and the per-grid-step fixed costs (one grid instead of two).

Each step recomputes the FIR for the (nfft-hop)-sample framing halo —
~10% redundant MXU work, free in an HBM-bound kernel.

Same conventions as oracle.fir_direct + oracle.noise_gate chained;
see docs/KERNELS.md for the layout strategy.
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
from audiosignalprocess_tpu.kernels.gate_kernel import (
    floor_grid, inv_norm_rows, ola_rows,
)
from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.overlap_save import overlap_save
from audiosignalprocess_tpu.ops.stft import frame as frame_op
from audiosignalprocess_tpu.utils.validate import check




def fir_gate_rows(cfg, w3, j, floor_b, wv, inv_norm_blk,
                  c1, s1, c2, s2, tbc, tbs, hgr, hgi, spill, rel):
    """Shared fused FIR+gate body: (tb, wrows, n2) raw rows (prefix-
    aligned: rows [j*span_r - e0r ...]) -> (tb, span_r, n2) gated output
    rows.  Writes the OLA ``spill`` and release ``rel`` VMEM carries.
    Used by the FIR+gate chain kernel and the resample+FIR+gate kernel.
    """
    (n1, n2, br, e0r, nb_os, hr, nr, dr, mf,
     thresh_gain, att, nframes, release) = cfg
    # ---- FIR: overlap-save over nb_os blocks at row hop br
    blocks = jnp.stack([w3[:, k * br : k * br + n1, :] for k in range(nb_os)],
                       axis=1)
    sr, si = fourstep_grid_fwd(blocks, None, n1, n2,
                               c1, s1, c2, s2, tbc, tbs)
    pr = sr * hgr - si * hgi
    pi_ = sr * hgi + si * hgr
    fil4 = fourstep_grid_inv_real(pr, pi_, n1, n2,
                                  c1, s1, c2, s2, tbc, tbs)
    # valid filtered rows per block: [e0r, e0r+br) -> contiguous row stream
    filtered = jnp.concatenate(
        [fil4[:, k, e0r : e0r + br, :] for k in range(nb_os)], axis=1
    )  # (tb, nb_os*br, n2) == filtered rows [j*span_r, ...)
    # ---- gate: frame, window, FFT, mask, inverse, window
    frames = jnp.stack(
        [filtered[:, q * hr : q * hr + nr, :] for q in range(mf)], axis=1
    )
    gr, gi = fourstep_grid_fwd(frames * wv, None, n1, n2,
                               c1, s1, c2, s2, tbc, tbs)
    mag = jnp.sqrt(gr * gr + gi * gi)
    floor = floor_b[:, None, :, :]
    mask = jnp.where(mag > floor * thresh_gain, 1.0, att).astype(gr.dtype)
    if release > 0.0:
        # max-with-decay release smoothing s_q = max(mask_q, r*s_{q-1})
        # across ALL frames (same carry trick as gate_kernel: grid steps
        # run sequentially, the state rides VMEM scratch)
        state = rel[:]
        rows = []
        for q in range(mf):
            state = jnp.maximum(mask[:, q], release * state)
            rows.append(state)
        rel[:] = state
        mask = jnp.stack(rows, axis=1)
    y = fourstep_grid_inv_real(gr * mask, gi * mask, n1, n2,
                               c1, s1, c2, s2, tbc, tbs) * wv
    fidx = j * mf + jax.lax.broadcasted_iota(jnp.int32, (1, mf, 1, 1), 1)
    y = y * (fidx < nframes).astype(y.dtype)
    # ---- OLA + spill carry (shared with the gate kernel)
    return ola_rows(y, spill, mf, hr, dr, n2) * inv_norm_blk


def _chain_kernel(cfg, x_hbm, floor_ref, wgrid, inv_norm,
                  c1, s1, c2, s2, tbc, tbs, hgr, hgi,
                  o_ref, win, spill, rel, sem):
    (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt,
     thresh_gain, att, nframes, release) = cfg
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = mf * hr
    # raw rows needed: [j*span_r - e0r ... j*span_r + (nb_os-1)*br + n1)
    wrows = (nb_os - 1) * br + n1

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
    w3 = win[slot]  # (tb, wrows, n2) raw rows (prefix-aligned)
    body_cfg = (n1, n2, br, e0r, nb_os, hr, nr, dr, mf,
                thresh_gain, att, nframes, release)
    o_ref[:] = fir_gate_rows(body_cfg, w3, j, floor_ref[:], wgrid[:],
                             inv_norm[0], c1[:], s1[:], c2[:], s2[:],
                             tbc[:], tbs[:], hgr[:], hgi[:], spill, rel)


def fir_noise_gate_fused(
    x: jnp.ndarray,
    h,
    nfft: int = 1024,
    hop: int = 256,
    threshold_db: float = 6.0,
    reduction_db: float = 60.0,
    noise_frames: int = 8,
    release: float = 0.0,
    window_kind: str = "hann",
    frames_per_step: int = 32,
    batch_tile: int = 32,
) -> jnp.ndarray:
    """overlap-save FIR (h, nfft) -> spectral noise gate, fully fused.

    == oracle.noise_gate(oracle.fir_direct(x, h), ...); output length
    nfft + (F-1)*hop.  FIR FFT size == gate nfft (one table set).
    ``release`` is the one-pole mask release smoothing (same semantics as
    effects.noise_gate / gate_kernel.noise_gate_fused).
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    check(nfft % hop == 0 and nfft & (nfft - 1) == 0 and nfft > t - 1, 'guard failed: nfft % hop == 0 and nfft & (nfft - 1) == 0 and nfft > t - 1')
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, (nfft - hop) // n2
    e0 = -(-(t - 1) // n2) * n2
    b = ((nfft - e0) // n2) * n2
    check(b >= n2, 'guard failed: b >= n2')
    br, e0r = b // n2, e0 // n2

    batch = x.shape[:-1]
    n = x.shape[-1]
    xf = x.reshape((-1, n))
    bs = xf.shape[0]
    dt = x.dtype
    d = nfft - hop
    nframes = 1 + (n - nfft) // hop
    out_len = nfft + (nframes - 1) * hop
    check(nframes * hop >= 2 * d, "signal too short")

    mf = int(frames_per_step)
    align = max(1, -(-8 // hr))
    mf = -(-mf // align) * align
    nt = -(-(nframes + nfft // hop - 1) // mf)
    total_f = nt * mf
    span_r = mf * hr

    # filtered rows needed per step: span_r + dr; os blocks to cover them
    nb_os = -(-(span_r + dr) // br)

    # ---- XLA prologue: noise floor of the FILTERED signal's first frames
    wv_np = oracle.window(window_kind, nfft, periodic=True)
    pro_len = d + noise_frames * hop + nfft
    pro = overlap_save(xf[:, : min(n, pro_len)], h, nfft, impl="matmul")
    prof = frame_op(pro[:, : d + noise_frames * hop], nfft, hop) * jnp.asarray(
        wv_np, dt)
    floor = floor_grid(prof, n1, n2, dt)

    # ---- input prefix: e0 samples (zeros + causal FIR history semantics)
    need = total_f * hop + d + (nb_os - 1) * b + nfft  # generous
    xp = jnp.concatenate([
        jnp.zeros((bs, e0), dt), xf,
        jnp.zeros((bs, max(0, need - n)), dt),
    ], axis=-1)
    tb = int(min(batch_tile, bs))
    bp = -(-bs // tb) * tb
    if bp != bs:
        xp = jnp.pad(xp, ((0, bp - bs), (0, 0)))
        floor = jnp.pad(floor, ((0, bp - bs), (0, 0), (0, 0)))
    nrows_in = xp.shape[-1] // n2
    xp3 = xp[:, : nrows_in * n2].reshape(bp, nrows_in, n2)

    hf = np.fft.fft(np.concatenate([h, np.zeros(nfft - t)]))
    hg = hf.reshape(n2, n1).T
    inv_norm = jnp.asarray(
        inv_norm_rows(wv_np, nfft, hop, nframes, total_f * hop), dt
    ).reshape(1, total_f * hr, n2)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    tabs = grid_table_arrays(nfft, dt, (n1, n2)) + [
        jnp.asarray(hg.real.copy(), dt), jnp.asarray(hg.imag.copy(), dt)]
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    cfg = (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt,
           thresh_gain, att, nframes, float(release))
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, j: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
    wrows = (nb_os - 1) * br + n1
    y = pl.pallas_call(
        functools.partial(_chain_kernel, cfg),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((tb, n1, n2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  bs_c(wgrid),
                  pl.BlockSpec((1, span_r, n2), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM)]
        + [bs_c(t_) for t_ in tabs],
        out_specs=pl.BlockSpec((tb, span_r, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, total_f * hr, n2), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tb, wrows, n2), dt),
            pltpu.VMEM((tb, dr, n2), dt),
            pltpu.VMEM((tb, n1, n2), dt),  # release-smoothing state
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp3, floor, wgrid, inv_norm, *tabs)
    out = y.reshape(bp, total_f * hop)[:bs, :out_len]
    return out.reshape(batch + (out_len,))
