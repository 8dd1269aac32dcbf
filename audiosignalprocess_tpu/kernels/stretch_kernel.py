"""Fused streaming phase-vocoder step kernel (pipeline.StretchStage).

One pallas_call per Chain.step block: frame + window + forward grid FFT,
analysis-FIFO push, static slot reads, rotor phase propagation (the
sequential prefix product over the block's synthesis frames, seeded by
the carried accumulator), magnitude interpolation, inverse grid FFT,
window, OLA — with every streaming carry (analysis FIFO, z0 rotor, phase
accumulator, OLA tail) flowing through the kernel as planar grid-layout
inputs/outputs.  The jnp step (pipeline.StretchStage.step) round-trips
HBM ~8x per block (frames/spectra/rotors each a pass); this kernel reads
the block + carries once and writes the emitted samples + carries once.

Layout: the spectrum lives in the four-step (n1, n2) grid over the FULL
n-point FFT.  All rotor algebra is per-bin elementwise, and the mirror
bins of a real signal carry conjugate rotors, so full-spectrum
propagation is exactly the half-spectrum computation mirrored — the
inverse real grid FFT then matches the jnp irfft path (same argument as
the gate kernel's full-spectrum mask).

Position logic (z0-capture hit, emit mask, WOLA normalization) depends
only on the carried block counter — it is computed in XLA and enters as
tiny (frames, n2) mask rows, exactly like gate_step_fused.

Numerics match pipeline.StretchStage.step (oracle-pinned via
effects.phase_vocoder) to f32 reassociation: the kernel's prefix product
is sequential over the block's mo frames while the jnp path uses a
log-depth associative scan — same arithmetic, different association.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.effects.phase_vocoder import unit_rotor
from audiosignalprocess_tpu.kernels.fft_kernel import (
    _grid_split,
    _interpret,
    vmem_tile_cap,
    check_kernel_dtype,
    fourstep_grid_fwd,
    fourstep_grid_inv_real,
    grid_post_tables,
    grid_table_arrays,
)
from audiosignalprocess_tpu.kernels.gate_kernel import (
    carry_tail_rows, ola_rows, wola_inorm_rows,
)
from audiosignalprocess_tpu.utils.validate import check


def _stretch_step_kernel(m, mo, hr, nr, dr, n1, n2, depth, slots, fracs,
                         tail_ref, x_ref, fr_ref, fi_ref, z0r_ref, z0i_ref,
                         ar_ref, ai_ref, ot_ref, hit_ref, emit_ref,
                         inorm_ref, wgrid, c1, s1, c2, s2, tbc, tbs,
                         c2p, s2p,
                         y_ref, fro_ref, fio_ref, z0ro_ref, z0io_ref,
                         aro_ref, aio_ref, oto_ref):
    wv = wgrid[:]                                     # (n1, n2) grid window
    ext = jnp.concatenate([tail_ref[:], x_ref[:]], axis=1)  # (tb, dr+br, n2)
    frames = jnp.stack([ext[:, q * hr: q * hr + nr, :] for q in range(m)],
                       axis=1)                        # (tb, m, n1, n2)
    sr, si = fourstep_grid_fwd(frames * wv[None, None], None, n1, n2,
                               c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:])
    # z0 capture: the first true analysis frame's unit rotor, one-hot on
    # the physical frame counter (hit rows are built in XLA from blk)
    fur, fui = unit_rotor(sr, si)
    hit = hit_ref[:][None, :, None, :]                # (1, m, 1, n2)
    z0r = z0r_ref[:] + jnp.sum(fur * hit, axis=1)
    z0i = z0i_ref[:] + jnp.sum(fui * hit, axis=1)
    z0ro_ref[:] = z0r
    z0io_ref[:] = z0i
    # analysis FIFO: push m new frames, keep the last `depth`
    buf_r = carry_tail_rows(fr_ref[:], sr)
    buf_i = carry_tail_rows(fi_ref[:], si)
    fro_ref[:] = buf_r
    fio_ref[:] = buf_i
    # static slot reads for the mo synthesis frames
    s0r = jnp.stack([buf_r[:, s] for s in slots], axis=1)
    s0i = jnp.stack([buf_i[:, s] for s in slots], axis=1)
    s1r = jnp.stack([buf_r[:, s + 1] for s in slots], axis=1)
    s1i = jnp.stack([buf_i[:, s + 1] for s in slots], axis=1)
    emit = emit_ref[:][None, :, None, :]              # (1, mo, 1, n2)
    ur, ui = unit_rotor(s1r * s0r + s1i * s0i, s1i * s0r - s1r * s0i)
    ur = jnp.where(emit > 0, ur, 1.0)
    ui = jnp.where(emit > 0, ui, 0.0)
    # sequential prefix product over the block's synthesis frames, seeded
    # by the carried accumulator (matches the jnp path's seeded exclusive
    # associative scan, reassociated)
    cr, ci = ar_ref[:], ai_ref[:]                     # (tb, n1, n2)
    rows_r, rows_i = [], []
    for u in range(mo):
        phr = z0r * cr - z0i * ci
        phi = z0r * ci + z0i * cr
        f = float(fracs[u])
        mag = ((1.0 - f) * jnp.hypot(s0r[:, u], s0i[:, u])
               + f * jnp.hypot(s1r[:, u], s1i[:, u])) * emit[:, u]
        rows_r.append(mag * phr)
        rows_i.append(mag * phi)
        cr, ci = (cr * ur[:, u] - ci * ui[:, u],
                  cr * ui[:, u] + ci * ur[:, u])
    aro_ref[:] = cr
    aio_ref[:] = ci
    synth_r = jnp.stack(rows_r, axis=1)               # (tb, mo, n1, n2)
    synth_i = jnp.stack(rows_i, axis=1)
    # the synthesis inverse adds FLAT per-frame noise only (nothing it
    # touches re-enters the rotor recursion) — it stays on the 3-pass
    # pair (family "vfft_post"); the ANALYSIS forward above is the one
    # whose noise the recursion integrates (family "vfft", pinned)
    y = fourstep_grid_inv_real(synth_r, synth_i, n1, n2,
                               c1[:], s1[:], c2p[:], s2p[:],
                               tbc[:], tbs[:])
    y = y * wv[None, None]
    oto_ref[:] = ot_ref[:]                            # seed the OLA carry
    emit_rows = ola_rows(y, oto_ref, mo, hr, dr, n2)  # (tb, mo*hr, n2)
    y_ref[:] = emit_rows * inorm_ref[:][None]


def stretch_step_fused(
    x: jnp.ndarray,
    state: dict,
    *,
    nfft: int,
    hop: int,
    m: int,
    mo: int,
    depth: int,
    slots: np.ndarray,
    fracs: np.ndarray,
    n_skip: int,
    off: int,
    window_kind: str,
    head_norm: np.ndarray,
    const_norm: float,
    batch_tile: int = 8,
    eof_frames_out: int | None = None,
    tail_norm: np.ndarray | None = None,
):
    """Fused Pallas streaming stretch step: (state, x) -> (new_state, y).

    Drop-in for pipeline.StretchStage.step with the grid-layout carry from
    stretch_step_init_state.  The static FIFO geometry (depth, slots,
    fracs) comes from StretchStage._slots; x is (batch..., m*hop) and y is
    (batch..., mo*hop).
    """
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    batch = x.shape[:-1]
    b = x.shape[-1]
    dt = x.dtype
    d = nfft - hop
    check(b == m * hop, f"block {b} != m*hop = {m * hop}")
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, d // n2
    br = b // n2

    xf = x.reshape((-1, b))
    bs = xf.shape[0]
    flat = lambda a: a.reshape((bs,) + a.shape[len(batch):])
    in_tail = flat(state["in_tail"])
    fifo_r, fifo_i = flat(state["gfifo_r"]), flat(state["gfifo_i"])
    z0r, z0i = flat(state["gz0r"]), flat(state["gz0i"])
    accr, acci = flat(state["gaccr"]), flat(state["gacci"])
    ola_tail = flat(state["ola_tail"])

    # position logic (XLA): z0-capture hit, emit mask, WOLA norm rows
    blk = state["blk"]
    phys = blk * m + jnp.arange(m, dtype=jnp.int32)
    ones_row = jnp.ones((1, n2), dt)
    hit2 = (phys == n_skip).astype(dt)[:, None] * ones_row      # (m, n2)
    i_glob = blk * mo + jnp.arange(mo, dtype=jnp.int32) - off
    emit_f = i_glob >= 0
    eof_out = None
    if eof_frames_out is not None:
        # drained stream (pipeline.Chain.stream(drain=True)): output
        # frames past the oracle's count reference straddling analysis
        # frames full() never synthesizes — mask them, and switch the
        # emission norm to the finite-file ramp-out past eof_out
        emit_f = jnp.logical_and(emit_f, i_glob < eof_frames_out)
        eof_out = nfft + (eof_frames_out - 1) * hop if eof_frames_out else 0
    emit2 = emit_f.astype(dt)[:, None] * ones_row               # (mo, n2)
    pvec = (blk * mo - off) * hop + jnp.arange(mo * hop, dtype=jnp.int32)
    inorm = wola_inorm_rows(pvec, head_norm, const_norm, d, mo * hr, n2, dt,
                            eof_out=eof_out, tail_norm=tail_norm)

    wv_np = oracle.window(window_kind, nfft, periodic=True)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    # analysis tables family "vfft" (pinned by default: the rotor
    # recursion integrates analysis-spectrum noise as a random walk —
    # measured 76.1 -> 103.7 dB on the 128-block soak), synthesis pair
    # "vfft_post" (3-pass)
    tabs = grid_table_arrays(nfft, dt, (n1, n2), family="vfft")
    tabs = tabs + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=tabs,
                                   family="vfft_post", pre_family="vfft")

    # VMEM-aware batch tile: analysis+synthesis frame grids, rotor planes
    # and the depth-deep spectral FIFO (in/out/concat temporaries)
    tb = int(min(batch_tile, bs,
                 vmem_tile_cap(14, (b // hop + nfft // hop + depth) * nfft,
                               dt.itemsize)))
    bp = -(-bs // tb) * tb
    pad_b = lambda a: jnp.pad(a, ((0, bp - bs),) + ((0, 0),) * (a.ndim - 1)) \
        if bp != bs else a
    x3 = pad_b(xf.reshape(bs, br, n2))
    tail3 = pad_b(in_tail.reshape(bs, dr, n2))
    ot3 = pad_b(ola_tail.reshape(bs, dr, n2))
    fifo_r, fifo_i = pad_b(fifo_r), pad_b(fifo_i)
    z0r, z0i, accr, acci = pad_b(z0r), pad_b(z0i), pad_b(accr), pad_b(acci)
    # padded batch rows run the same rotor algebra on zero spectra; keep
    # their accumulator neutral so unit_rotor's zero-guard never divides
    if bp != bs:
        accr = accr.at[bs:].set(1.0)

    bs_b = lambda shp: pl.BlockSpec(
        (tb,) + shp[1:], (lambda i, _n=len(shp): (i,) + (0,) * (_n - 1)),
        memory_space=pltpu.VMEM)
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, _n=a.ndim: (0,) * _n),
                                  memory_space=pltpu.VMEM)
    ins = [tail3, x3, fifo_r, fifo_i, z0r, z0i, accr, acci, ot3,
           hit2, emit2, inorm, wgrid] + tabs
    in_specs = ([bs_b(a.shape) for a in
                 (tail3, x3, fifo_r, fifo_i, z0r, z0i, accr, acci, ot3)]
                + [bs_c(hit2), bs_c(emit2), bs_c(inorm), bs_c(wgrid)]
                + [bs_c(t) for t in tabs])
    out_shape = (jax.ShapeDtypeStruct((bp, mo * hr, n2), dt),
                 jax.ShapeDtypeStruct((bp, depth, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, depth, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, dr, n2), dt))
    out_specs = tuple(bs_b(s.shape) for s in out_shape)
    y3, fro, fio, z0ro, z0io, aro, aio, oto = pl.pallas_call(
        functools.partial(_stretch_step_kernel, m, mo, hr, nr, dr, n1, n2,
                          depth, tuple(int(s) for s in slots),
                          tuple(float(f) for f in fracs)),
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
        gz0r=unb(z0ro),
        gz0i=unb(z0io),
        gaccr=unb(aro),
        gacci=unb(aio),
        ola_tail=unb(oto).reshape(batch + (d,)),
        blk=(blk + 1).astype(jnp.int32),
    )
    y = unb(y3).reshape(batch + (mo * hop,))
    return new_state, y


def stretch_step_init_state(batch: tuple, nfft: int, hop: int, depth: int,
                            dtype):
    """Grid-layout streaming carry for stretch_step_fused (the fused
    analogue of pipeline.StretchStage.init_state's bin-space carry)."""
    n1, n2 = _grid_split(nfft)
    d = nfft - hop
    return dict(
        in_tail=jnp.zeros(batch + (d,), dtype),
        gfifo_r=jnp.zeros(batch + (depth, n1, n2), dtype),
        gfifo_i=jnp.zeros(batch + (depth, n1, n2), dtype),
        gz0r=jnp.zeros(batch + (n1, n2), dtype),
        gz0i=jnp.zeros(batch + (n1, n2), dtype),
        gaccr=jnp.ones(batch + (n1, n2), dtype),
        gacci=jnp.zeros(batch + (n1, n2), dtype),
        ola_tail=jnp.zeros(batch + (d,), dtype),
        blk=jnp.zeros((), jnp.int32),
    )
