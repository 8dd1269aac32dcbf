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
    vmem_tile_cap,
)
from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.stft import frame as frame_op
from audiosignalprocess_tpu.utils.validate import check




def floor_grid(frames_windowed, n1, n2, dtype):
    """Per-channel noise-floor in the kernel's (n1, n2) grid layout from
    pre-windowed prologue frames (shared by the gate and chain kernels)."""
    floor_half = jnp.mean(jnp.abs(fft_ops.rfft(frames_windowed, impl="matmul")),
                          axis=-2).astype(dtype)
    return floor_half_to_grid(floor_half, n1, n2)


def inv_norm_rows(wv_np, nfft, hop, nframes, total_len):
    """Full-length 1/WOLA-norm vector over the padded output: head ramp,
    interior constant, tail ramp, then 1.0 in the zero padding."""
    out_len = nfft + (nframes - 1) * hop
    w2 = wv_np ** 2
    norm_np = np.zeros(total_len)
    for k in range(nframes):
        norm_np[k * hop : k * hop + nfft] += w2
    inv = 1.0 / oracle.wola_clamp(norm_np[:out_len])
    return np.concatenate([inv, np.ones(total_len - out_len)])


def carry_tail_rows(prev, new):
    """Next cross-block carry: the last ``prev.shape[1]`` rows of
    ``concat([prev, new], axis=1)``, sliced at an 8-ALIGNED sublane
    offset.  Mosaic's lower-to-LLO pass hits a ``d >> 32 == 0`` CHECK
    (libtpu SIGABRT, not a catchable trace error) on sublane slices of
    in-kernel values at 8-unaligned row offsets for some geometries
    (measured matrix: docs/KERNELS.md §1); left-padding with zero rows
    so the slice offset lands on a sublane-tile boundary compiles at
    every measured geometry.  Shared by every fused step kernel's
    FIFO/tail update (axis 1 row carries, any trailing dims)."""
    rows = prev.shape[1]
    m = new.shape[1]
    if m == rows:
        return new
    pad = (-m) % 8
    pieces = [prev, new]
    if pad:
        pieces.insert(0, jnp.zeros(
            prev.shape[:1] + (pad,) + prev.shape[2:], prev.dtype))
    return jnp.concatenate(pieces, axis=1)[:, pad + m:]


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


def _gate_kernel(hr, nr, dr, mf, nt, n1, n2, thresh_gain, att,
                 release,
                 x_hbm, floor_ref, wgrid, inv_norm, valid_ref,
                 c1, s1, c2, s2, tbc, tbs, c2p, s2p,
                 o_ref, win, spill, rel, sem):
    """Grid (batch_tiles, frame_tiles); row space (rows of n2 samples):
    hr = hop rows, nr = nfft rows (== n1), dr = (nfft-hop) rows."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = mf * hr
    wrows = win.shape[2]  # span_r + dr rounded for HBM DMA row alignment

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
    # synthesis inverse is POST-decision (family "gpost": 3-pass under
    # the default gpre pin — see fft_kernel._PIN_DEFAULT)
    y = fourstep_grid_inv_real(sr * mask, si * mask, n1, n2,
                               c1[:], s1[:], c2p[:], s2p[:],
                               tbc[:], tbs[:]) * wv
    # invalid frames (past the last whole frame — the oracle has no
    # partial frames — or, on the sharded path, past the global EOF) are
    # padding that still overlaps real samples — zero their contributions
    y = y * valid_ref[:][None, :, None, :]
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
    check(nframes >= noise_frames,
          f"signal has {nframes} frames < noise_frames={noise_frames}")
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
    wfetch = hbm_fetch_rows(mf * hr + dr, n2)
    # pad input so every padded frame exists (zero frames mask to zero)
    # and the last (row-aligned) DMA window is in bounds
    need = ((nt - 1) * mf * hr + wfetch) * n2
    xp = jnp.concatenate([xf, jnp.zeros((b, max(0, need - n)), dt)], axis=-1)
    # VMEM-aware batch tile: ~12 live (tb, mf, n1, n2) grid planes per
    # step (windowed frames, fwd/inv four-step intermediates, mask)
    tb = int(min(batch_tile, b, vmem_tile_cap(12, mf * nfft, x.dtype.itemsize)))
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
    valid = jnp.asarray(
        (np.arange(total_f) < nframes).astype(np.float64), dt
    )[:, None] * jnp.ones((1, n2), dt)
    y = _gate_call(xp3, floor, valid, inv_norm, wv_np, nfft, hop,
                   threshold_db, reduction_db, release, mf, nt, tb, dt)
    out = y.reshape(bp, total_f * hop)[:b, :out_len]
    return out.reshape(batch + (out_len,))


def _gate_call(xp3, floor, valid, inv_norm, wv_np, nfft, hop, threshold_db,
               reduction_db, release, mf, nt, tb, dt):
    """Shared pallas_call for the whole-file and per-shard gate wrappers:
    row-space input + grid floor + per-frame valid rows + 1/norm rows ->
    emitted OLA rows."""
    n1, n2 = _grid_split(nfft)
    d = nfft - hop
    hr, nr, dr = hop // n2, nfft // n2, d // n2
    bp = xp3.shape[0]
    wfetch = hbm_fetch_rows(mf * hr + dr, n2)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    # analysis forward tables are PRE-decision (family "gpre", pinned by
    # default); the synthesis inverse gets its own pair ("gpost")
    tabs = grid_table_arrays(nfft, dt, (n1, n2), family="gpre")
    tabs = tabs + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=tabs,
                                   family="gpost", pre_family="gpre")
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, j: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
    span_r = mf * hr
    return pl.pallas_call(
        functools.partial(_gate_kernel, hr, nr, dr, mf, nt, n1, n2,
                          thresh_gain, att, float(release)),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((tb, n1, n2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  bs_c(wgrid),
                  pl.BlockSpec((1, span_r, n2), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((mf, n2), lambda i, j: (j, 0),
                               memory_space=pltpu.VMEM)]
        + [bs_c(t) for t in tabs],
        out_specs=pl.BlockSpec((tb, span_r, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, nt * mf * hr, n2), dt),
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
    )(xp3, floor, wgrid, inv_norm, valid, *tabs)


def floor_grid_prologue_half(x_pro, nfft, hop, window_kind):
    """Per-channel HALF-spectrum noise floor from the first frames, using
    the fused kernel's prologue convention (windowed frames -> matmul
    rfft -> mean |.|) so the sharded and whole-file fused gates share
    floor numerics bit-for-bit.  x_pro: (…, nfft + (noise_frames-1)*hop)."""
    wv = jnp.asarray(oracle.window(window_kind, nfft, periodic=True),
                     x_pro.dtype)
    pro = frame_op(x_pro, nfft, hop) * wv
    return jnp.mean(jnp.abs(fft_ops.rfft(pro, impl="matmul")),
                    axis=-2).astype(x_pro.dtype)


def floor_half_to_grid(floor_half, n1, n2):
    """(…, nbins) half-spectrum magnitude floor -> the kernel's (n1, n2)
    grid layout (mirror to the full spectrum, G[c, d] = floor[n1*d + c]).
    The sharded gate computes/psums its floor in the XLA half-spectrum
    layout (parallel/sharded.gate_shard_body) and feeds the kernel here."""
    nfft = n1 * n2
    mirror = np.minimum(np.arange(nfft), nfft - np.arange(nfft))
    floor_full = jnp.take(floor_half, jnp.asarray(mirror), axis=-1)
    return jnp.transpose(floor_full.reshape(-1, n2, n1), (0, 2, 1))


def gate_shard_fused(
    x_ext: jnp.ndarray,
    floor_half: jnp.ndarray,
    valid_f: jnp.ndarray,
    nfft: int,
    hop: int,
    threshold_db: float,
    reduction_db: float,
    window_kind: str = "hann",
    frames_per_step: int = 8,
    batch_tile: int = 32,
) -> jnp.ndarray:
    """Per-shard fused gate for the TIME-SHARDED path (BASELINE.json:5
    Pallas inner loops on the sharded pod path): frame + FFT + mask +
    IFFT + OLA of one shard's frames in ONE kernel, with the cross-shard
    constructs supplied from outside — ``floor_half`` is the psum'd
    global noise floor (XLA half-spectrum layout), ``valid_f`` masks the
    shard's frames against the global EOF, and the returned OLA is
    UN-normalized with its d-sample spill tail attached (…, l + d): the
    caller (parallel/sharded.gate_shard_body) exchanges the spill via
    send_right_add and divides by the global-position WOLA norm.

    x_ext: (…, l + d) local samples + right halo, l a multiple of hop.
    Release smoothing is not supported (its cross-shard scan correction
    needs the masks before synthesis — the jnp body handles release).
    """
    x_ext = jnp.asarray(x_ext)
    check_kernel_dtype(x_ext.dtype)
    check(nfft % hop == 0, 'guard failed: nfft % hop == 0')
    d = nfft - hop
    batch = x_ext.shape[:-1]
    l = x_ext.shape[-1] - d
    check(l % hop == 0 and l >= hop, f"shard length {l} not a multiple of hop")
    m = l // hop
    dt = x_ext.dtype
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    hr = hop // n2
    xf = x_ext.reshape((-1, l + d))
    b = xf.shape[0]

    wv_np = oracle.window(window_kind, nfft, periodic=True)
    floor = floor_half_to_grid(
        jnp.broadcast_to(floor_half.reshape((-1, floor_half.shape[-1]))
                         .astype(dt), (b, nfft // 2 + 1)), n1, n2)

    mf = int(frames_per_step)
    align = max(1, -(-8 // hr))
    mf = -(-mf // align) * align
    nt = -(-(m + nfft // hop - 1) // mf)
    total_f = nt * mf
    wfetch = hbm_fetch_rows(mf * hr + d // n2, n2)
    need = ((nt - 1) * mf * hr + wfetch) * n2
    xp = jnp.concatenate(
        [xf, jnp.zeros((b, max(0, need - (l + d))), dt)], axis=-1)
    tb = int(min(batch_tile, b,
                 vmem_tile_cap(12, mf * nfft, x_ext.dtype.itemsize)))
    bp = -(-b // tb) * tb
    valid = jnp.concatenate(
        [valid_f.astype(dt), jnp.zeros((total_f - m,), dt)]
    )[:, None] * jnp.ones((1, n2), dt)
    if bp != b:
        xp = jnp.pad(xp, ((0, bp - b), (0, 0)))
        floor = jnp.pad(floor, ((0, bp - b), (0, 0), (0, 0)))
    nrows_in = xp.shape[-1] // n2
    xp3 = xp[:, : nrows_in * n2].reshape(bp, nrows_in, n2)
    inv_norm = jnp.ones((1, total_f * hr, n2), dt)
    y = _gate_call(xp3, floor, valid, inv_norm, wv_np, nfft, hop,
                   threshold_db, reduction_db, 0.0, mf, nt, tb, dt)
    out = y.reshape(bp, total_f * hop)[:b, : l + d]
    return out.reshape(batch + (l + d,))


# ---------------------------------------------------------------------------
# fused streaming step (pipeline.GateStage block path)
# ---------------------------------------------------------------------------
#
# One pallas_call per Chain.step block: frame + window + forward grid FFT +
# noise-floor mask + inverse FFT + window + OLA, with every streaming carry
# (spectral FIFO, floor accumulator, OLA tail, release state) flowing
# through the kernel as planar grid-layout inputs/outputs.  Replaces the
# multi-pass jnp step (frame/rfft/mask/irfft/OLA each round-tripping HBM)
# with a single read of the block + carries and a single write of the
# emitted samples + carries.  Position logic (frame validity, floor-take
# counting, WOLA edge normalization) is tiny and stays in XLA; numerics
# match pipeline.GateStage.step / effects.noise_gate (oracle-pinned).


def wola_inorm_rows(pvec, head_norm, const_norm, d, rows, n2, dt,
                    eof_out=None, tail_norm=None):
    """Streaming WOLA 1/norm rows at output positions ``pvec``: 1.0 in
    the pre-signal region, the head ramp over [0, d), constant after.
    With ``eof_out``/``tail_norm`` set (a drained stream,
    pipeline.Chain.stream(drain=True)): the finite-file ramp-out over
    [eof_out - d, eof_out) and 1.0 past ``eof_out`` (only zeros are
    emitted there), so the drained emission reproduces the whole-file
    istft's position-wise edge normalization exactly.  Shared by the
    gate/chain and stretch step wrappers."""
    head = jnp.asarray(head_norm, dt)
    const = jnp.asarray(const_norm, dt)
    idx = jnp.clip(pvec, 0, d - 1)
    norm = jnp.where(pvec < 0, 1.0, jnp.where(pvec < d, head[idx], const))
    if eof_out is not None:
        tail = jnp.asarray(tail_norm, dt)
        ti = jnp.clip(pvec - (eof_out - d), 0, d - 1)
        norm = jnp.where(pvec >= eof_out, 1.0,
                         jnp.where(pvec >= eof_out - d, tail[ti], norm))
    return (1.0 / norm).reshape(rows, n2)


def gate_step_masks(state, m, b_out, d, hop, noise_frames, input_latency,
                    latency, head_norm, const_norm, span_r, n2, dt,
                    eof_in=None, tail_norm=None):
    """Position-dependent per-block gate-step inputs, shared by the gate,
    FIR+gate and resample+FIR+gate step wrappers: frame validity /
    noise-floor-take masks and the WOLA 1/norm rows (head ramp while the
    block overlaps the whole-file ramp-in region, constant after).
    ``eof_in`` (drained stream): stream position one past the last real
    input sample — frames straddling end-of-file are invalidated (the
    whole-file gate only analyzes complete frames) and the emission norm
    switches to the finite-file ramp-out (see wola_inorm_rows)."""
    nfft = d + hop
    starts = state["pos"] - d + hop * jnp.arange(m, dtype=jnp.int32)
    valid_f = (starts >= input_latency)
    eof_out = None
    if eof_in is not None:
        valid_f = jnp.logical_and(valid_f, starts + nfft <= eof_in)
        # whole-file synthesis length: nfft + K*hop for complete frames
        # 0..K (positions past it emit zeros, matching full()'s pad-back)
        n_real = eof_in - input_latency
        eof_out = nfft + ((n_real - nfft) // hop) * hop if n_real >= nfft else 0
    take_f = jnp.logical_and(
        valid_f,
        state["floor_n"] + jnp.cumsum(valid_f.astype(jnp.int32))
        <= noise_frames,
    )
    ones_row = jnp.ones((1, n2), dt)
    valid2 = valid_f.astype(dt)[:, None] * ones_row
    take2 = take_f.astype(dt)[:, None] * ones_row
    p0 = state["pos"] - latency - input_latency
    pvec = p0 + jnp.arange(b_out, dtype=jnp.int32)
    inorm = wola_inorm_rows(pvec, head_norm, const_norm, d, span_r, n2, dt,
                            eof_out=eof_out, tail_norm=tail_norm)
    return valid2, take2, take_f, inorm


def gate_step_rows(m, hr, nr, dr, n1, n2, nf, thresh_gain, att, release,
                   src,
                   fr_ref, fi_ref, fs_ref, ot_ref, rel_ref,
                   valid_ref, take_ref, inorm_ref, wgrid,
                   c1, s1, c2, s2, tbc, tbs,
                   fro_ref, fio_ref, fso_ref, oto_ref, relo_ref,
                   c2p=None, s2p=None):
    """THE streaming gate-step body on in-VMEM rows: frame + FFT +
    noise-floor accumulation + spectral FIFO + mask/release + inverse +
    OLA, all carries in grid layout.  Returns the WOLA-normalized
    emitted (tb, m*hr, n2) rows.

    ``src``: (tb, dr + m*hr, n2) gate-domain rows — the previous tail
    followed by this block's new rows.  Shared single source of truth
    for the standalone gate step (_gate_step_kernel) and the composite
    FIR->gate / resample->FIR->gate step kernels
    (chain_kernel.fir_gate_step_rows), so the oracle-pinned streaming
    numerics cannot diverge between GateStage and the fused chains."""
    wv = wgrid[:]                                     # (n1, n2) grid window
    frames = jnp.stack([src[:, q * hr: q * hr + nr, :] for q in range(m)],
                       axis=1)                        # (tb, m, n1, n2)
    # latency-padding frames carry no signal: zero them (pre-FFT, which is
    # equivalent to the jnp path's post-FFT spectrum zeroing — linearity)
    frames = frames * wv[None, None] * valid_ref[:][None, :, None, :]
    sr, si = fourstep_grid_fwd(frames, None, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    mag = jnp.sqrt(sr * sr + si * si)
    # noise-floor accumulation over this block's designated take frames
    fs_new = fs_ref[:] + jnp.sum(mag * take_ref[:][None, :, None, :], axis=1)
    fso_ref[:] = fs_new
    # spectral FIFO (depth nf): pop the oldest m, push the m new frames
    buf_r = jnp.concatenate([fr_ref[:], sr], axis=1)  # (tb, nf+m, n1, n2)
    buf_i = jnp.concatenate([fi_ref[:], si], axis=1)
    pr, pi = buf_r[:, :m], buf_i[:, :m]
    fro_ref[:] = carry_tail_rows(fr_ref[:], sr)
    fio_ref[:] = carry_tail_rows(fi_ref[:], si)
    floor = (fs_new * (1.0 / nf))[:, None]            # (tb, 1, n1, n2)
    pmag = jnp.sqrt(pr * pr + pi * pi)
    mask = jnp.where(pmag > floor * thresh_gain, 1.0, att).astype(pr.dtype)
    if release > 0.0:
        # s_q = max(mask_q, release * s_{q-1}) across the popped frames,
        # carried across steps (matches the whole-file scan exactly)
        state = rel_ref[:]
        rows = []
        for q in range(m):
            state = jnp.maximum(mask[:, q], release * state)
            rows.append(state)
        relo_ref[:] = state
        mask = jnp.stack(rows, axis=1)
    else:
        relo_ref[:] = rel_ref[:]  # pass-through (all outputs must be written)
    # synthesis inverse is POST-decision: the composite kernels pass a
    # separate table pair (family "cfft_post", 3-pass under the default
    # cfftpre pin — see fft_kernel._PIN_DEFAULT); None = same tables
    c2i = c2 if c2p is None else c2p
    s2i = s2 if s2p is None else s2p
    y = fourstep_grid_inv_real(pr * mask, pi * mask, n1, n2,
                               c1[:], s1[:], c2i[:], s2i[:],
                               tbc[:], tbs[:]) * wv
    oto_ref[:] = ot_ref[:]                            # seed the OLA carry
    emit = ola_rows(y, oto_ref, m, hr, dr, n2)        # (tb, m*hr, n2)
    return emit * inorm_ref[:][None]


def _gate_step_kernel(m, hr, nr, dr, n1, n2, nf, thresh_gain, att, release,
                      tail_ref, x_ref, fr_ref, fi_ref, fs_ref, ot_ref,
                      rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
                      c1, s1, c2, s2, tbc, tbs, c2p, s2p,
                      y_ref, fro_ref, fio_ref, fso_ref, oto_ref, relo_ref):
    ext = jnp.concatenate([tail_ref[:], x_ref[:]], axis=1)  # (tb, dr+br, n2)
    y_ref[:] = gate_step_rows(
        m, hr, nr, dr, n1, n2, nf, thresh_gain, att, release, ext,
        fr_ref, fi_ref, fs_ref, ot_ref, rel_ref,
        valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs,
        fro_ref, fio_ref, fso_ref, oto_ref, relo_ref, c2p=c2p, s2p=s2p)


def gate_step_fused(
    x: jnp.ndarray,
    state: dict,
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
    eof_in: int | None = None,
    tail_norm: np.ndarray | None = None,
):
    """Fused Pallas streaming gate step: (state, x) -> (new_state, y).

    Drop-in for pipeline.GateStage.step with the grid-layout carry produced
    by gate_step_init_state (spectral FIFO / floor / release are carried in
    the four-step (n1, n2) grid layout so they enter the kernel directly).
    x is (batch..., b) with b a multiple of hop; y matches x's shape.
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    batch = x.shape[:-1]
    b = x.shape[-1]
    dt = x.dtype
    d = nfft - hop
    check(b % hop == 0 and b >= hop, f"block {b} not a multiple of hop={hop}")
    m = b // hop
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, d // n2
    br = b // n2

    xf = x.reshape((-1, b))
    bs = xf.shape[0]
    flat = lambda a: a.reshape((bs,) + a.shape[len(batch):])
    in_tail = flat(state["in_tail"])
    fifo_r, fifo_i = flat(state["gfifo_r"]), flat(state["gfifo_i"])
    floor_sum = flat(state["gfloor_sum"])
    ola_tail = flat(state["ola_tail"])
    # release state: minimal placeholder planes when smoothing is off
    # (the kernel's else-branch only copies rel -> relo)
    rel = flat(state["grel"]) if release > 0.0 else jnp.zeros(
        (bs, 8, 128), dt)

    # position logic (XLA): frame validity, floor-take counting, WOLA norm
    valid2, take2, take_f, inorm = gate_step_masks(
        state, m, b, d, hop, noise_frames, input_latency, latency,
        head_norm, const_norm, br, n2, dt, eof_in=eof_in,
        tail_norm=tail_norm)

    wv_np = oracle.window(window_kind, nfft, periodic=True)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    # pre-decision analysis tables (family "gpre", default-pinned) + the
    # post-decision synthesis pair ("gpost")
    tabs = grid_table_arrays(nfft, dt, (n1, n2), family="gpre")
    tabs = tabs + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=tabs,
                                   family="gpost", pre_family="gpre")
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    # VMEM-aware batch tile: the step holds the block's frames, the
    # noise_frames-deep spectral FIFO (in, out, and concat temporaries),
    # and the nfft/hop framing halo as live grids
    tb = int(min(batch_tile, bs,
                 vmem_tile_cap(
                     12, (b // hop + nfft // hop + noise_frames) * nfft,
                     x.dtype.itemsize)))
    bp = -(-bs // tb) * tb
    pad_b = lambda a: jnp.pad(a, ((0, bp - bs),) + ((0, 0),) * (a.ndim - 1)) \
        if bp != bs else a
    x3 = pad_b(xf.reshape(bs, br, n2))
    tail3 = pad_b(in_tail.reshape(bs, dr, n2))
    ot3 = pad_b(ola_tail.reshape(bs, dr, n2))
    fifo_r, fifo_i = pad_b(fifo_r), pad_b(fifo_i)
    floor_sum, rel = pad_b(floor_sum), pad_b(rel)

    bs_b = lambda shp: pl.BlockSpec(
        (tb,) + shp[1:], (lambda i, _n=len(shp): (i,) + (0,) * (_n - 1)),
        memory_space=pltpu.VMEM)
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, _n=a.ndim: (0,) * _n),
                                  memory_space=pltpu.VMEM)
    ins = [tail3, x3, fifo_r, fifo_i, floor_sum, ot3, rel,
           valid2, take2, inorm, wgrid] + tabs
    in_specs = ([bs_b(tail3.shape), bs_b(x3.shape), bs_b(fifo_r.shape),
                 bs_b(fifo_i.shape), bs_b(floor_sum.shape), bs_b(ot3.shape),
                 bs_b(rel.shape)]
                + [bs_c(valid2), bs_c(take2), bs_c(inorm), bs_c(wgrid)]
                + [bs_c(t) for t in tabs])
    out_shape = (jax.ShapeDtypeStruct((bp, br, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, dr, n2), dt),
                 jax.ShapeDtypeStruct(rel.shape, dt))  # placeholder-sized
                                                       # when release off
    out_specs = tuple(bs_b(s.shape) for s in out_shape)
    y3, fro, fio, fso, oto, relo = pl.pallas_call(
        functools.partial(_gate_step_kernel, m, hr, nr, dr, n1, n2,
                          float(noise_frames), thresh_gain, att,
                          float(release)),
        grid=(bp // tb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*ins)

    unb = lambda a: a[:bs].reshape(batch + a.shape[1:])
    ext_tail = jnp.concatenate([in_tail, xf], axis=-1)[..., -d:]
    new_state = dict(
        in_tail=ext_tail.reshape(batch + (d,)),
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
    y = unb(y3).reshape(batch + (b,))
    return new_state, y


def gate_step_init_state(batch: tuple, nfft: int, hop: int,
                         noise_frames: int, release: float, dtype):
    """Grid-layout streaming carry for gate_step_fused (the fused analogue
    of pipeline.GateStage.init_state's bin-space carry)."""
    n1, n2 = _grid_split(nfft)
    d = nfft - hop
    st = dict(
        in_tail=jnp.zeros(batch + (d,), dtype),
        gfifo_r=jnp.zeros(batch + (noise_frames, n1, n2), dtype),
        gfifo_i=jnp.zeros(batch + (noise_frames, n1, n2), dtype),
        gfloor_sum=jnp.zeros(batch + (n1, n2), dtype),
        floor_n=jnp.zeros((), jnp.int32),
        ola_tail=jnp.zeros(batch + (d,), dtype),
        pos=jnp.zeros((), jnp.int32),
    )
    if release > 0.0:
        st["grel"] = jnp.zeros(batch + (n1, n2), dtype)
    return st
