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
    grid_post_tables,
    hbm_fetch_rows,
    tap_spectrum_grid,
    vmem_tile_cap,
)
from audiosignalprocess_tpu.kernels.gate_kernel import (
    carry_tail_rows, floor_grid, gate_step_masks, gate_step_rows,
    inv_norm_rows, ola_rows,
)
from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.overlap_save import overlap_save
from audiosignalprocess_tpu.ops.stft import frame as frame_op
from audiosignalprocess_tpu.utils.validate import check




def fir_gate_rows(cfg, w3, j, floor_b, wv, inv_norm_blk,
                  c1, s1, c2, s2, tbc, tbs, hgr, hgi, spill, rel,
                  c2p=None, s2p=None):
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
    # synthesis inverse is POST-decision: the composite kernel passes a
    # separate table pair (family "cfft_post"); None = same tables
    c2i = c2 if c2p is None else c2p
    s2i = s2 if s2p is None else s2p
    y = fourstep_grid_inv_real(gr * mask, gi * mask, n1, n2,
                               c1, s1, c2i, s2i, tbc, tbs) * wv
    fidx = j * mf + jax.lax.broadcasted_iota(jnp.int32, (1, mf, 1, 1), 1)
    y = y * (fidx < nframes).astype(y.dtype)
    # ---- OLA + spill carry (shared with the gate kernel)
    return ola_rows(y, spill, mf, hr, dr, n2) * inv_norm_blk


def _chain_kernel(cfg, x_hbm, floor_ref, wgrid, inv_norm,
                  c1, s1, c2, s2, tbc, tbs, hgr, hgi, c2p, s2p,
                  o_ref, win, spill, rel, sem):
    (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt,
     thresh_gain, att, nframes, release) = cfg
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = mf * hr
    # raw rows needed: [j*span_r - e0r ... j*span_r + (nb_os-1)*br + n1),
    # rounded for HBM DMA row alignment (win's scratch shape)
    wrows = win.shape[2]

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
                             tbc[:], tbs[:], hgr[:], hgi[:], spill, rel,
                             c2p=c2p[:], s2p=s2p[:])


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
    batch_tile: int = 8,
) -> jnp.ndarray:
    """overlap-save FIR (h, nfft) -> spectral noise gate, fully fused.

    batch_tile default 8 (round 5): interleaved on-chip A/B at the
    headline geometry (64ch x 10s, 3 reps/arm) measured tb=8 faster
    than the old tb=32 default BOTH under the default pins (1.559 vs
    1.475e9 samples/s) and unpinned (1.828 vs 1.715e9) — smaller
    batch tiles give the two-level grid more pipelinable steps at the
    same VMEM residency.  tb=16 measured WORSE than both (1.410e9);
    the relation is not monotonic, so re-sweep (tools/tune_tiles.py)
    rather than interpolate.

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
    check(br >= 3 or e0r % 8 == 0,
          f"taps {t} leave only {br} valid overlap-save rows at an "
          f"8-unaligned row offset — a Mosaic lowering crash class "
          f"(docs/KERNELS.md constraint 7): raise nfft")

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
    wfetch = hbm_fetch_rows((nb_os - 1) * br + nr, n2)
    # cover the last (row-aligned) DMA window, plus slack
    need = ((nt - 1) * span_r + wfetch) * n2 + nfft
    xp = jnp.concatenate([
        jnp.zeros((bs, e0), dt), xf,
        jnp.zeros((bs, max(0, need - n)), dt),
    ], axis=-1)
    # VMEM-aware batch tile: FIR span blocks + gate frame grids live
    # together (~10 planes of (tb, mf, n1, n2) through the two four-steps;
    # calibrated so the shipped mf=32 default keeps its measured tb=32)
    tb = int(min(batch_tile, bs, vmem_tile_cap(10, mf * nfft, dt.itemsize)))
    bp = -(-bs // tb) * tb
    if bp != bs:
        xp = jnp.pad(xp, ((0, bp - bs), (0, 0)))
        floor = jnp.pad(floor, ((0, bp - bs), (0, 0), (0, 0)))
    nrows_in = xp.shape[-1] // n2
    xp3 = xp[:, : nrows_in * n2].reshape(bp, nrows_in, n2)

    inv_norm = jnp.asarray(
        inv_norm_rows(wv_np, nfft, hop, nframes, total_f * hop), dt
    ).reshape(1, total_f * hr, n2)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    # pre-decision tables (family "gpre", default-pinned: the FIR
    # fwd+inv and the gate analysis feed the threshold comparison) +
    # tap spectrum + the post-decision synthesis pair ("gpost")
    gtabs = grid_table_arrays(nfft, dt, (n1, n2), family="gpre")
    tabs = gtabs + tap_spectrum_grid(h, nfft, n1, n2, dt) \
        + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=gtabs,
                           family="gpost", pre_family="gpre")
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    cfg = (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt,
           thresh_gain, att, nframes, float(release))
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, j: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
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
            pltpu.VMEM((2, tb, wfetch, n2), dt),
            pltpu.VMEM((tb, dr, n2), dt),
            # release-smoothing state (minimal placeholder when off)
            pltpu.VMEM((tb, n1, n2) if release > 0.0 else (tb, 8, 128), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xp3, floor, wgrid, inv_norm, *tabs)
    out = y.reshape(bp, total_f * hop)[:bs, :out_len]
    return out.reshape(batch + (out_len,))


# ---------------------------------------------------------------------------
# fused streaming step (pipeline.FIRGateStage block path)
# ---------------------------------------------------------------------------
#
# One pallas_call per streaming block for the FIR -> gate chain: the raw
# block plus a raw-input tail carry enter VMEM once, the FIR runs as
# grid-FFT overlap-save over the in-VMEM window (recomputing the
# (nfft-hop)-sample framing halo from raw input — the same redundant-MXU
# trick as the whole-file chain kernel, so no filtered-domain carry is
# needed), and the gate step (frame + FFT + noise-floor mask + inverse +
# OLA with spill/release carries) runs on the filtered rows in-register.
# Halves the streaming chain's HBM passes vs overlap_save_fused +
# gate_step_fused per block.  Numerics match FIRStage -> GateStage
# streaming (oracle-pinned).


def fir_gate_step_rows(m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
                       nf, thresh_gain, att, release,
                       xrows,
                       tail_ref, fr_ref, fi_ref, fs_ref, ot_ref,
                       rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
                       c1, s1, c2, s2, tbc, tbs, hgr, hgi,
                       fro_ref, fio_ref, fso_ref, oto_ref,
                       relo_ref, c2p=None, s2p=None):
    """Shared streaming FIR->gate step body on in-VMEM raw rows.
    Returns the emitted (tb, m*hr, n2) output rows (WOLA-normalized);
    callers write them (or feed them to the envelope tail) themselves.

    xrows: (tb, m*hr, n2) this block's raw (pre-FIR) rows.  Used by the
    FIR+gate step kernel (rows DMA'd as an input) and the resample+FIR+
    gate step kernel (rows produced in-kernel by the phase matmuls)."""
    tb = xrows.shape[0]
    pieces = [tail_ref[:], xrows]
    if zpad_r:
        # zero future rows: the OS valid region only uses causal taps, so
        # outputs at in-block positions are exact (see wrapper notes)
        pieces.append(jnp.zeros((tb, zpad_r, n2), xrows.dtype))
    w3 = jnp.concatenate(pieces, axis=1)
    # ---- FIR: overlap-save over nb_os blocks at row hop br
    blocks = jnp.stack([w3[:, k * br : k * br + nr, :] for k in range(nb_os)],
                       axis=1)
    sr, si = fourstep_grid_fwd(blocks, None, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    pr = sr * hgr[:] - si * hgi[:]
    pi_ = sr * hgi[:] + si * hgr[:]
    fil4 = fourstep_grid_inv_real(pr, pi_, n1, n2,
                                  c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    filtered = jnp.concatenate(
        [fil4[:, k, e0r : e0r + br, :] for k in range(nb_os)], axis=1
    )[:, : dr + m * hr]  # filtered rows [pos-d, pos+b)
    # ---- gate step on the filtered rows (THE shared streaming gate body)
    return gate_step_rows(
        m, hr, nr, dr, n1, n2, nf, thresh_gain, att, release, filtered,
        fr_ref, fi_ref, fs_ref, ot_ref, rel_ref,
        valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs,
        fro_ref, fio_ref, fso_ref, oto_ref, relo_ref,
        c2p=c2p, s2p=s2p)


def envelope_step_rows(e0re, bre, nb_e, zpad_e, nr, n1, n2, scale,
                       yrows, etail_ref,
                       c1, s1, c2, s2, tbc, tbs, hegr, hegi,
                       etailo_ref):
    """Envelope tail on emitted step rows: |y| -> overlap-save FIR
    (tap spectrum hegr/hegi in grid layout) -> *scale, with the rectified
    tail carried across blocks (== FIRStage(pre="abs").step semantics,
    SURVEY.md §2 row 12).  yrows: (tb, span_r, n2) gate-output rows;
    returns the envelope rows of the same shape."""
    a = jnp.abs(yrows)
    etailo_ref[:] = carry_tail_rows(etail_ref[:], a)
    pieces = [etail_ref[:], a]
    if zpad_e:
        # zero future rows: outputs at in-block positions use causal taps
        # only (same argument as the raw-tail zero pad above)
        pieces.append(jnp.zeros((a.shape[0], zpad_e, n2), a.dtype))
    w3 = jnp.concatenate(pieces, axis=1)
    blocks = jnp.stack([w3[:, k * bre : k * bre + nr, :] for k in range(nb_e)],
                       axis=1)
    sr, si = fourstep_grid_fwd(blocks, None, n1, n2,
                               c1, s1, c2, s2, tbc, tbs)
    pr = sr * hegr - si * hegi
    pi_ = sr * hegi + si * hegr
    e4 = fourstep_grid_inv_real(pr, pi_, n1, n2,
                                c1, s1, c2, s2, tbc, tbs)
    env = jnp.concatenate(
        [e4[:, k, e0re : e0re + bre, :] for k in range(nb_e)], axis=1
    )[:, : yrows.shape[1]]
    return env * scale


def _fir_gate_step_kernel(m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
                          nf, thresh_gain, att, release,
                          tail_ref, x_ref, fr_ref, fi_ref, fs_ref, ot_ref,
                          rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
                          c1, s1, c2, s2, tbc, tbs, hgr, hgi, c2p, s2p,
                          y_ref, fro_ref, fio_ref, fso_ref, oto_ref,
                          relo_ref):
    y_ref[:] = fir_gate_step_rows(
        m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
        nf, thresh_gain, att, release,
        x_ref[:],
        tail_ref, fr_ref, fi_ref, fs_ref, ot_ref,
        rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs, hgr, hgi,
        fro_ref, fio_ref, fso_ref, oto_ref,
        relo_ref, c2p=c2p, s2p=s2p)


def _fir_gate_env_step_kernel(m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
                              nf, thresh_gain, att, release,
                              e0re, bre, nb_e, zpad_e, scale,
                              tail_ref, x_ref, fr_ref, fi_ref, fs_ref,
                              ot_ref, rel_ref, etail_ref,
                              valid_ref, take_ref, inorm_ref, wgrid,
                              c1, s1, c2, s2, tbc, tbs, hgr, hgi, c2p, s2p,
                              hegr, hegi,
                              y_ref, fro_ref, fio_ref, fso_ref, oto_ref,
                              relo_ref, etailo_ref):
    """FIR -> gate -> envelope demod step, ONE kernel: the full headline
    chain per streaming block (BASELINE.json:11 back half included)."""
    rows = fir_gate_step_rows(
        m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
        nf, thresh_gain, att, release,
        x_ref[:],
        tail_ref, fr_ref, fi_ref, fs_ref, ot_ref,
        rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs, hgr, hgi,
        fro_ref, fio_ref, fso_ref, oto_ref,
        relo_ref, c2p=c2p, s2p=s2p)
    # the envelope tail is POST-decision: it runs on the gate's output,
    # so its transforms stay on the 3-pass pair (family "gpost")
    y_ref[:] = envelope_step_rows(
        e0re, bre, nb_e, zpad_e, nr, n1, n2, scale,
        rows, etail_ref,
        c1[:], s1[:], c2p[:], s2p[:], tbc[:], tbs[:], hegr[:], hegi[:],
        etailo_ref)




def fir_gate_step_tables(h, nfft, window_kind, n1, n2, dt, family="fft"):
    """(wgrid, tabs): windowed-grid + four-step/taps-spectrum kernel
    inputs shared by the step wrappers (tap spectrum in grid layout).
    ``family`` names the grid tables' matmul family for the per-family
    precision pins (the composite step passes "cfft")."""
    wv_np = oracle.window(window_kind, nfft, periodic=True)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    tabs = grid_table_arrays(nfft, dt, (n1, n2), family) + tap_spectrum_grid(
        h, nfft, n1, n2, dt)
    return wgrid, tabs


def envelope_step_geometry(env_h, nfft, span_r, nr, n1, n2, dt):
    """Envelope-tail geometry + grid-layout tap spectrum for the fused
    step kernels: (e0re, bre, nb_e, zpad_e, hegr, hegi)."""
    he = np.asarray(env_h, np.float64)
    te = len(he)
    check(te >= 2, "envelope FIR needs at least 2 taps")
    e0e = -(-(te - 1) // n2) * n2
    check(e0e <= nfft - n2,
          f"envelope taps {te} need e0={e0e} > nfft-{n2}: raise nfft")
    e0re = e0e // n2
    bre = (nfft - e0e) // n2
    check(bre >= 3 or e0re % 8 == 0,
          f"envelope taps {te} leave only {bre} valid overlap-save rows "
          f"at an 8-unaligned row offset — a Mosaic lowering crash class "
          f"(docs/KERNELS.md constraint 7): raise nfft")
    nb_e = -(-span_r // bre)
    wrows_e = (nb_e - 1) * bre + nr
    zpad_e = max(0, wrows_e - (e0re + span_r))
    hegr, hegi = tap_spectrum_grid(he, nfft, n1, n2, dt)
    return e0re, bre, nb_e, zpad_e, hegr, hegi


def fir_gate_step_fused(
    x: jnp.ndarray,
    state: dict,
    h,
    *,
    nfft: int,
    hop: int,
    threshold_db: float,
    reduction_db: float,
    noise_frames: int,
    release: float,
    window_kind: str,
    input_latency: int,
    latency: int,
    head_norm: np.ndarray,
    const_norm: float,
    batch_tile: int = 8,
    env_h=None,
    env_scale: float = 1.0,
    eof_in: int | None = None,
    tail_norm: np.ndarray | None = None,
):
    """Fused Pallas streaming FIR+gate step: (state, x) -> (new_state, y).

    One kernel per block for the FIRStage(nfft) -> GateStage(nfft, hop)
    chain.  The carry is the RAW input tail (nfft-hop + e0 samples, e0 =
    taps-1 rounded up to the row width) plus the gate carries in grid
    layout — the FIR history and the gate framing halo are recomputed
    from raw rows in VMEM instead of being carried in the filtered
    domain.  x is (batch..., b), b a multiple of hop; y matches.

    ``env_h`` folds an envelope-demod tail (|y| -> overlap-save FIR ->
    *env_scale, rectified tail carried in ``state["env_tail"]``) into the
    SAME kernel — the whole FIR -> gate -> envelope chain step in one
    pallas_call (== appending FIRStage(pre="abs", post_scale=env_scale)).
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    h = np.asarray(h, dtype=np.float64)
    t = len(h)
    check(nfft % hop == 0 and nfft & (nfft - 1) == 0 and nfft > t - 1,
          "nfft must be a power of two multiple of hop, > taps-1")
    batch = x.shape[:-1]
    b = x.shape[-1]
    dt = x.dtype
    d = nfft - hop
    check(b % hop == 0 and b >= hop, f"block {b} not a multiple of hop={hop}")
    m = b // hop
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, d // n2
    span_r = m * hr
    e0 = -(-(t - 1) // n2) * n2
    e0r = e0 // n2
    br = (nfft - e0) // n2
    check(br >= 1, f"taps {t} leave no valid overlap-save rows at nfft={nfft}")
    check(br >= 3 or e0r % 8 == 0,
          f"taps {t} leave only {br} valid overlap-save rows at an "
          f"8-unaligned row offset — a Mosaic lowering crash class "
          f"(docs/KERNELS.md constraint 7): raise nfft")
    nb_os = -(-(dr + span_r) // br)
    wrows_need = (nb_os - 1) * br + nr
    zpad_r = max(0, wrows_need - (dr + e0r + span_r))

    xf = x.reshape((-1, b))
    bs = xf.shape[0]
    flat = lambda a: a.reshape((bs,) + a.shape[len(batch):])
    in_tail = flat(state["in_tail"])          # raw tail, d + e0 samples
    fifo_r, fifo_i = flat(state["gfifo_r"]), flat(state["gfifo_i"])
    floor_sum = flat(state["gfloor_sum"])
    ola_tail = flat(state["ola_tail"])
    # release state: minimal placeholder planes when smoothing is off
    rel = flat(state["grel"]) if release > 0.0 else jnp.zeros(
        (bs, 8, 128), dt)

    # position logic (XLA) — identical to gate_step_fused
    valid2, take2, take_f, inorm = gate_step_masks(
        state, m, b, d, hop, noise_frames, input_latency, latency,
        head_norm, const_norm, span_r, n2, dt, eof_in=eof_in,
        tail_norm=tail_norm)

    wgrid, tabs = fir_gate_step_tables(h, nfft, window_kind, n1, n2, dt,
                                       family="gpre")
    tabs = tabs + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=tabs[:6],
                                   family="gpost", pre_family="gpre")
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    env = env_h is not None
    if env:
        e0re, bre, nb_e, zpad_e, hegr, hegi = envelope_step_geometry(
            env_h, nfft, span_r, nr, n1, n2, dt)
        etail = flat(state["env_tail"])
        check(etail.shape[-2:] == (e0re, n2),
              f"env_tail must be {(e0re, n2)} rows, got {etail.shape[-2:]}")

    # VMEM-aware batch tile: block frames, the noise_frames-deep spectral
    # FIFO (in/out/concat temporaries), the framing halo (+ the envelope
    # OS blocks when folded in)
    tb = int(min(batch_tile, bs,
                 vmem_tile_cap(
                     16 if env else 12,
                     (b // hop + nfft // hop + noise_frames) * nfft,
                     x.dtype.itemsize)))
    bp = -(-bs // tb) * tb
    pad_b = lambda a: jnp.pad(a, ((0, bp - bs),) + ((0, 0),) * (a.ndim - 1)) \
        if bp != bs else a
    x3 = pad_b(xf.reshape(bs, span_r, n2))
    tail3 = pad_b(in_tail.reshape(bs, dr + e0r, n2))
    ot3 = pad_b(ola_tail.reshape(bs, dr, n2))
    fifo_r, fifo_i = pad_b(fifo_r), pad_b(fifo_i)
    floor_sum, rel = pad_b(floor_sum), pad_b(rel)

    bs_b = lambda shp: pl.BlockSpec(
        (tb,) + shp[1:], (lambda i, _n=len(shp): (i,) + (0,) * (_n - 1)),
        memory_space=pltpu.VMEM)
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, _n=a.ndim: (0,) * _n),
                                  memory_space=pltpu.VMEM)
    tiled = [tail3, x3, fifo_r, fifo_i, floor_sum, ot3, rel]
    if env:
        tiled.append(pad_b(etail))
    consts = [valid2, take2, inorm, wgrid] + tabs + ([hegr, hegi] if env
                                                     else [])
    ins = tiled + consts
    in_specs = [bs_b(a.shape) for a in tiled] + [bs_c(a) for a in consts]
    out_shape = [jax.ShapeDtypeStruct((bp, span_r, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, dr, n2), dt),
                 jax.ShapeDtypeStruct(rel.shape, dt)]  # placeholder-sized
                                                       # when release off
    if env:
        out_shape.append(jax.ShapeDtypeStruct((bp, e0re, n2), dt))
    out_shape = tuple(out_shape)
    out_specs = tuple(bs_b(s.shape) for s in out_shape)
    if env:
        kern = functools.partial(
            _fir_gate_env_step_kernel, m, hr, nr, dr, br, e0r,
            nb_os, zpad_r, n1, n2, float(noise_frames),
            thresh_gain, att, float(release),
            e0re, bre, nb_e, zpad_e, float(env_scale))
    else:
        kern = functools.partial(
            _fir_gate_step_kernel, m, hr, nr, dr, br, e0r,
            nb_os, zpad_r, n1, n2, float(noise_frames),
            thresh_gain, att, float(release))
    outs = pl.pallas_call(
        kern,
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*ins)
    y3, fro, fio, fso, oto, relo = outs[:6]

    unb = lambda a: a[:bs].reshape(batch + a.shape[1:])
    ext_tail = jnp.concatenate([in_tail, xf], axis=-1)[..., -(d + e0):]
    new_state = dict(
        in_tail=ext_tail.reshape(batch + (d + e0,)),
        gfifo_r=unb(fro),
        gfifo_i=unb(fio),
        gfloor_sum=unb(fso),
        floor_n=(state["floor_n"]
                 + jnp.sum(take_f.astype(jnp.int32))).astype(jnp.int32),
        ola_tail=unb(oto).reshape(batch + (d,)),
        pos=(state["pos"] + b).astype(jnp.int32),
    )
    if release > 0.0:
        new_state["grel"] = unb(relo)
    if env:
        new_state["env_tail"] = unb(outs[6])
    y = unb(y3).reshape(batch + (b,))
    return new_state, y


def fir_gate_step_init_state(batch: tuple, nfft: int, hop: int, taps: int,
                             noise_frames: int, release: float, dtype,
                             env_taps: int = 0):
    """Raw-tail + grid-layout carry for fir_gate_step_fused.  When the
    envelope tail is folded in (env_taps >= 2), adds the rectified-tail
    carry ``env_tail`` in grid rows."""
    n1, n2 = _grid_split(nfft)
    d = nfft - hop
    e0 = -(-(taps - 1) // n2) * n2
    st = dict(
        in_tail=jnp.zeros(batch + (d + e0,), dtype),
        gfifo_r=jnp.zeros(batch + (noise_frames, n1, n2), dtype),
        gfifo_i=jnp.zeros(batch + (noise_frames, n1, n2), dtype),
        gfloor_sum=jnp.zeros(batch + (n1, n2), dtype),
        floor_n=jnp.zeros((), jnp.int32),
        ola_tail=jnp.zeros(batch + (d,), dtype),
        pos=jnp.zeros((), jnp.int32),
    )
    if release > 0.0:
        st["grel"] = jnp.zeros(batch + (n1, n2), dtype)
    if env_taps >= 2:
        e0e = -(-(env_taps - 1) // n2) * n2
        st["env_tail"] = jnp.zeros(batch + (e0e // n2, n2), dtype)
    return st
