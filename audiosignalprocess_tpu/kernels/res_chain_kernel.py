"""Fully-fused resample + FIR + spectral-gate chain kernel (config-5 hot
path, BASELINE.json:11; VERDICT round-1 item 5).

One Pallas kernel runs the whole 44.1->48 kHz front half of the flagship
chain: polyphase rational resample (phase-matrix MXU matmuls), overlap-
save FIR, STFT noise gate with OLA spill carry.  Raw audio is read from
HBM once (as the ~1.3x-overlapped resampler window array V5) and the
gated signal written once — vs the two-kernel pipeline's extra round
trip of the resampled/filtered signal.

Layout: everything stays in the row space / grid layout of
docs/KERNELS.md.  The resampler emits 128-sample ROWS directly: over a
SUPERCYCLE of lcm(up, 128) outputs (R5 rows, C5 polyphase cycles,
D5 = C5*down inputs) the phase pattern repeats, so R5 static per-row
phase matrices M5[q] (W5, 128) turn one DMA'd input window into R5 row
tensors via MXU dots — no lane reshape anywhere (a (cycles, up) product
would need the banned 160->128 minor reshape).  The FIR+gate body is
shared with chain_kernel.fir_gate_rows.

Conventions == oracle.noise_gate(oracle.fir_direct(oracle.resample_poly
(x, up, down), h_fir)); output length nfft + (F-1)*hop for the frames of
the resampled length.
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
from audiosignalprocess_tpu.kernels.chain_kernel import fir_gate_rows
from audiosignalprocess_tpu.kernels.fft_kernel import (
    _interpret,
    _grid_split,
    vmem_tile_cap,
    _use_bf16x3,
    split_bf16_np,
    check_kernel_dtype,
    grid_post_tables,
    grid_table_arrays,
    tap_spectrum_grid,
)
from audiosignalprocess_tpu.kernels.gate_kernel import (
    carry_tail_rows, floor_grid, inv_norm_rows,
)
from audiosignalprocess_tpu.kernels.resample_kernel import _phase_matrix
from audiosignalprocess_tpu.ops import fft as fft_ops
from audiosignalprocess_tpu.ops.overlap_save import overlap_save
from audiosignalprocess_tpu.ops.resample import resample_poly
from audiosignalprocess_tpu.ops.stft import frame as frame_op
from audiosignalprocess_tpu.utils.validate import check


def _lcm(a: int, b: int) -> int:
    return a * b // gcd(a, b)


def _m5_kernel_input(m5_np, r5, w5, w5p, dt):
    """Phase matrices -> the kernel input: right-pad the window dim to
    the DMA-aligned w5p and, under the 3-pass bf16 emulation, pre-split
    into (hi, lo) bf16 planes (shared by the whole-file and step
    wrappers so the emulation's operand layout has one definition)."""
    if _use_bf16x3(dt, "res"):
        m5s = np.stack([split_bf16_np(m5_np[q]) for q in range(r5)],
                       axis=1)  # (2, r5, w5, n2)
        m5s = np.pad(m5s, ((0, 0), (0, 0), (0, w5p - w5), (0, 0)))
        return jnp.asarray(m5s, jnp.bfloat16)
    return jnp.asarray(np.pad(m5_np, ((0, 0), (0, w5p - w5), (0, 0))), dt)


@functools.lru_cache(maxsize=32)  # keys hold full tap tuples: bound them
def _row_phase_matrices(h_key, up: int, down: int, n2: int):
    """Per-row supercycle phase matrices: M5 (R5, W5, n2) float64 with
    y[lcm*t5 + n2*q + l] = sum_i M5[q, i, l] * x[D5*t5 + base + i]."""
    m_np, base, r = _phase_matrix(h_key, up, down, 0)
    w = m_np.shape[1]
    lcm = _lcm(up, n2)
    r5 = lcm // n2
    c5 = lcm // up
    d5 = c5 * down
    w5 = down * (c5 - 1) + w
    m5 = np.zeros((r5, w5, n2))
    for q in range(r5):
        for l in range(n2):
            o = q * n2 + l
            tc, s = o // up, o % up
            m5[q, down * tc : down * tc + w, l] = m_np[s]
    return m5, base, w5


def _res_chain_kernel(cfg, v_hbm, floor_ref, wgrid, inv_norm,
                      c1, s1, c2, s2, tbc, tbs, hgr, hgi, c2p, s2p, m5,
                      o_ref, vwin, spill, rel, sem):
    (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt, s5, k5, r5, w5p, off,
     rows_lo_mask, rows_hi_mask, thresh_gain, att, nframes, release) = cfg
    i = pl.program_id(0)
    j = pl.program_id(1)
    tb = o_ref.shape[0]
    span_r = mf * hr
    wrows = (nb_os - 1) * br + n1

    def fetch(slot, jj):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(i * tb, tb), pl.ds(jj * s5, k5), :],
            vwin.at[slot],
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
    # (tb, k5, w5p) resampler input windows -> resampled rows (the
    # shared supercycle phase matmuls, incl. the 3-pass bf16 emulation)
    rows = _res_rows(vwin[slot], m5, r5, k5, n2, o_ref.dtype)
    # zero the FIR-history prefix rows and the past-the-end rows: the
    # resampler's warm-up/warm-down spill there must read as exact zeros
    # (the unfused chain pads the filtered stream with zeros).  rows[k]
    # sits at prefixed-stream row j*span_r - off + k.
    glob = (j * span_r - off) + jax.lax.broadcasted_iota(
        jnp.int32, (1, k5 * r5, 1), 1)
    keep = jnp.logical_and(glob >= rows_lo_mask, glob < rows_hi_mask)
    rows = rows * keep.astype(rows.dtype)
    w3 = rows[:, off : off + wrows, :]
    body_cfg = (n1, n2, br, e0r, nb_os, hr, nr, dr, mf,
                thresh_gain, att, nframes, release)
    o_ref[:] = fir_gate_rows(body_cfg, w3, j, floor_ref[:], wgrid[:],
                             inv_norm[0], c1[:], s1[:], c2[:], s2[:],
                             tbc[:], tbs[:], hgr[:], hgi[:], spill, rel,
                             c2p=c2p[:], s2p=s2p[:])


def resample_fir_gate_fused(
    x: jnp.ndarray,
    up: int,
    down: int,
    h_fir,
    h_res=None,
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
    """resample(up/down) -> overlap-save FIR -> spectral gate, ONE kernel.

    == oracle.noise_gate(oracle.fir_direct(oracle.resample_poly(x, up,
    down), h_fir), ...); output length = nfft + (F-1)*hop with F the
    frame count of the resampled length ceil(n*up/down).
    """
    g = gcd(up, down)
    up, down = up // g, down // g
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    if h_res is None:
        h_res = oracle.resample_filter(up, down)
    h_res = np.asarray(h_res, dtype=np.float64)
    h = np.asarray(h_fir, dtype=np.float64)
    t = len(h)
    check(nfft % hop == 0 and nfft & (nfft - 1) == 0 and nfft > t - 1,
          "nfft must be a hop-aligned power of two exceeding the FIR taps")
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of row width {n2}")
    hr, nr, dr = hop // n2, nfft // n2, (nfft - hop) // n2

    lcm = _lcm(up, n2)
    r5 = lcm // n2
    c5 = lcm // up
    d5 = c5 * down

    # OS emission offset: row-aligned only (the efficient block hop —
    # supercycle alignment is handled by a constant in-window row offset
    # `off` plus whole zero supercycles in front of V5)
    e0 = -(-(t - 1) // n2) * n2
    check(e0 <= nfft - n2, f"{t} taps need e0={e0} > nfft-{n2}: raise nfft")
    b = ((nfft - e0) // n2) * n2
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
    n_out = -(-n * up // down)
    check(n_out % n2 == 0,
          f"resampled length {n_out} not row-aligned: pad the input so "
          f"ceil(n*up/down) is a multiple of {n2}")
    nframes = 1 + (n_out - nfft) // hop
    out_len = nfft + (nframes - 1) * hop
    check(nframes * hop >= 2 * d, "signal too short")

    # frames per step: span_r = mf*hr must be a multiple of 8*R5 so both
    # the output rows (Mosaic sublane rule) and the per-step supercycle
    # hop s5 = span_r/R5 (HBM slice starts must be 8-aligned) work out
    mf = int(frames_per_step)
    while (mf * hr) % (8 * r5):
        mf += 1
    span_r = mf * hr
    nt = -(-(nframes + nfft // hop - 1) // mf)
    total_f = nt * mf
    s5 = span_r // r5

    nb_os = -(-(span_r + dr) // br)
    wrows = (nb_os - 1) * br + n1
    # fetched supercycles start at t5_lo(j) = j*s5 - ceil(e0r/R5); the
    # first generated row sits `off` rows before the rows the step needs
    # (constant: span_r % R5 == 0).  Mosaic HBM slices need the
    # second-to-last dim 8-aligned (slice starts j*s5 are aligned because
    # s5 = span_r/r5 is a multiple of 8 via mf).
    pre5 = -(-e0r // r5)  # zero supercycles in front of V5
    off = pre5 * r5 - e0r
    k5 = -(-(-(-(off + wrows) // r5) + 1) // 8) * 8

    # ---- XLA prologue: noise floor of the resampled+filtered head
    wv_np = oracle.window(window_kind, nfft, periodic=True)
    pro_in = min(n, ((d + noise_frames * hop + 2 * nfft) * down) // up + d5)
    pro_res = resample_poly(xf[:, :pro_in], up, down, h=h_res,
                            zero_phase=False)
    pro_fil = overlap_save(pro_res, h, nfft, impl="matmul")
    prof = frame_op(pro_fil[:, : d + noise_frames * hop], nfft, hop) * \
        jnp.asarray(wv_np, dt)
    floor = floor_grid(prof, n1, n2, dt)

    # ---- V5 window array build (XLA): prefix supercycles for the e0
    # zeros, left pad for the phase-matrix base, right pad for the tail
    m5_np, base, w5 = _row_phase_matrices(tuple(h_res.tolist()), up, down, n2)
    w5p = -(-w5 // 128) * 128
    t5_total = (nt - 1) * s5 + k5
    lpad = max(0, -base)
    shift = base + lpad
    need = shift + (t5_total - 1) * d5 + w5p
    xp = jnp.concatenate([
        jnp.zeros((bs, pre5 * d5 + lpad), dt), xf,
        jnp.zeros((bs, max(0, need - (pre5 * d5 + lpad + n))), dt),
    ], axis=-1)
    if shift:
        xp = xp[:, shift:]
    # VMEM-aware batch tile: supercycle phase matmuls + FIR span blocks
    # + gate frame grids live together (~8 budget planes of (tb, mf, n1,
    # n2); calibrated so the shipped default keeps its measured tb=32
    # after mf's supercycle-alignment round-up)
    tb = int(min(batch_tile, bs, vmem_tile_cap(8, mf * nfft, dt.itemsize)))
    bp = -(-bs // tb) * tb
    if bp != bs:
        xp = jnp.pad(xp, ((0, bp - bs), (0, 0)))
        floor = jnp.pad(floor, ((0, bp - bs), (0, 0), (0, 0)))
    r5win = -(-w5p // d5) + 1
    nrows5 = t5_total + r5win
    if xp.shape[-1] < nrows5 * d5:
        xp = jnp.pad(xp, ((0, 0), (0, nrows5 * d5 - xp.shape[-1])))
    x5 = xp[:, : nrows5 * d5].reshape(bp, nrows5, d5)
    v5 = jnp.concatenate([x5[:, q : q + t5_total, :] for q in range(r5win)],
                         axis=-1)[..., :w5p]

    # ---- tables
    inv_norm = jnp.asarray(
        inv_norm_rows(wv_np, nfft, hop, nframes, total_f * hop), dt
    ).reshape(1, total_f * hr, n2)
    wgrid = jnp.asarray(wv_np.reshape(n1, n2), dt)
    # family "cfft": the composite kernels' PRE-decision grid tables are
    # precision-pinned by default (measured gate-flip margin,
    # fft_kernel._PIN_DEFAULT); the post-decision synthesis pair rides
    # the cheaper emulation (family "cfft_post")
    gtabs = grid_table_arrays(nfft, dt, (n1, n2), family="cfft")
    tabs = gtabs + tap_spectrum_grid(h, nfft, n1, n2, dt) \
        + grid_post_tables(nfft, dt, (n1, n2), pre_tabs=gtabs)
    m5 = _m5_kernel_input(m5_np, r5, w5, w5p, dt)
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    rows_lo_mask = e0r
    rows_hi_mask = e0r + n_out // n2
    cfg = (n1, n2, br, e0r, nb_os, hr, nr, dr, mf, nt, s5, k5, r5, w5p, off,
           rows_lo_mask, rows_hi_mask, thresh_gain, att, nframes,
           float(release))
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, j: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_res_chain_kernel, cfg),
        grid=(bp // tb, nt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec((tb, n1, n2), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  bs_c(wgrid),
                  pl.BlockSpec((1, span_r, n2), lambda i, j: (0, j, 0),
                               memory_space=pltpu.VMEM)]
        + [bs_c(t_) for t_ in tabs] + [bs_c(m5)],
        out_specs=pl.BlockSpec((tb, span_r, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, total_f * hr, n2), dt),
        scratch_shapes=[
            pltpu.VMEM((2, tb, k5, w5p), dt),
            pltpu.VMEM((tb, dr, n2), dt),
            # release-smoothing state (minimal placeholder when off)
            pltpu.VMEM((tb, n1, n2) if release > 0.0 else (tb, 8, 128), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(v5, floor, wgrid, inv_norm, *tabs, m5)
    out = y.reshape(bp, total_f * hop)[:bs, :out_len]
    return out.reshape(batch + (out_len,))


# ---------------------------------------------------------------------------
# streaming step: resample + FIR + gate per block, ONE kernel (P5)
# ---------------------------------------------------------------------------


def _res_rows(v, m5, r5, t5b, n2, acc):
    """Supercycle phase matmuls: raw input windows -> resampled rows.
    ``v``: (tb, t5b, w5p) in-VMEM input-window VALUES.  The single
    source of truth for the 3-pass bf16 emulation — shared by the
    whole-file chain kernel and both step kernels."""
    tb = v.shape[0]
    dn = (((2,), (0,)), ((), ()))
    if m5.dtype == jnp.bfloat16:
        vh = v.astype(jnp.bfloat16)
        vl = (v - vh.astype(v.dtype)).astype(jnp.bfloat16)

        def mm(q):
            d = lambda p, t: jax.lax.dot_general(
                p, t, dimension_numbers=dn, preferred_element_type=acc)
            return d(vh, m5[0, q]) + d(vh, m5[1, q]) + d(vl, m5[0, q])
    else:
        def mm(q):
            return jax.lax.dot_general(
                v, m5[q], dimension_numbers=dn, preferred_element_type=acc,
                precision=jax.lax.Precision.HIGHEST)

    rows4 = jnp.stack([mm(q) for q in range(r5)], axis=2)  # (tb,T5b,r5,n2)
    return rows4.reshape(tb, t5b * r5, n2)


def _res_fir_gate_step_kernel(t5b, r5, m, hr, nr, dr, br, e0r, nb_os,
                              zpad_r, n1, n2, nf, thresh_gain, att, release,
                              v_ref, tail_ref, fr_ref, fi_ref, fs_ref,
                              ot_ref, rel_ref, valid_ref, take_ref,
                              inorm_ref, wgrid,
                              c1, s1, c2, s2, tbc, tbs, hgr, hgi,
                              c2p, s2p, m5,
                              y_ref, fro_ref, fio_ref, fso_ref, oto_ref,
                              relo_ref, tailo_ref):
    """Resample prologue (supercycle phase matmuls) + shared FIR->gate
    step body.  v_ref: (tb, T5b, W5p) raw input windows; the resampled
    rows never touch HBM.  c2p/s2p: the POST-decision (gate synthesis)
    n2-side tables — 3-pass under the default cfftpre pin while c2/s2
    are f32/HIGHEST (fft_kernel._PIN_DEFAULT)."""
    from audiosignalprocess_tpu.kernels.chain_kernel import fir_gate_step_rows

    xrows = _res_rows(v_ref[:], m5, r5, t5b, n2, y_ref.dtype)
    tailo_ref[:] = carry_tail_rows(tail_ref[:], xrows)
    y_ref[:] = fir_gate_step_rows(
        m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
        nf, thresh_gain, att, release,
        xrows,
        tail_ref, fr_ref, fi_ref, fs_ref, ot_ref,
        rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs, hgr, hgi,
        fro_ref, fio_ref, fso_ref, oto_ref,
        relo_ref, c2p=c2p, s2p=s2p)


def _res_fir_gate_env_step_kernel(t5b, r5, m, hr, nr, dr, br, e0r, nb_os,
                                  zpad_r, n1, n2, nf, thresh_gain, att,
                                  release,
                                  e0re, bre, nb_e, zpad_e, scale,
                                  v_ref, tail_ref, fr_ref, fi_ref, fs_ref,
                                  ot_ref, rel_ref, etail_ref,
                                  valid_ref, take_ref,
                                  inorm_ref, wgrid,
                                  c1, s1, c2, s2, tbc, tbs, hgr, hgi,
                                  hegr, hegi, c2p, s2p, m5,
                                  y_ref, fro_ref, fio_ref, fso_ref, oto_ref,
                                  relo_ref, tailo_ref, etailo_ref):
    """The ENTIRE config-5 chain per streaming block as ONE kernel:
    resample -> overlap-save FIR -> spectral gate -> envelope demod
    (BASELINE.json:11).  The gate synthesis inverse AND the whole
    envelope stage are post-decision: both run on the c2p/s2p table
    pair (family "cfft_post")."""
    from audiosignalprocess_tpu.kernels.chain_kernel import (
        envelope_step_rows, fir_gate_step_rows,
    )

    xrows = _res_rows(v_ref[:], m5, r5, t5b, n2, y_ref.dtype)
    tailo_ref[:] = carry_tail_rows(tail_ref[:], xrows)
    rows = fir_gate_step_rows(
        m, hr, nr, dr, br, e0r, nb_os, zpad_r, n1, n2,
        nf, thresh_gain, att, release,
        xrows,
        tail_ref, fr_ref, fi_ref, fs_ref, ot_ref,
        rel_ref, valid_ref, take_ref, inorm_ref, wgrid,
        c1, s1, c2, s2, tbc, tbs, hgr, hgi,
        fro_ref, fio_ref, fso_ref, oto_ref,
        relo_ref, c2p=c2p, s2p=s2p)
    y_ref[:] = envelope_step_rows(
        e0re, bre, nb_e, zpad_e, nr, n1, n2, scale,
        rows, etail_ref,
        c1[:], s1[:], c2p[:], s2p[:], tbc[:], tbs[:], hegr[:], hegi[:],
        etailo_ref)


def res_step_geometry(up: int, down: int, nfft: int, hop: int):
    """(b_in, b_out): the streaming block quantum for
    res_fir_gate_step_fused — the smallest raw block size (and the
    resampled samples it emits) satisfying BOTH kernel constraints:
    whole supercycles (b_in % D5 == 0) and hop-aligned output
    (b_out % hop == 0).  Any multiple is also valid."""
    g = gcd(up, down)
    up, down = up // g, down // g
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    lcm = _lcm(up, n2)  # resampled samples per supercycle
    d5 = (lcm // up) * down
    k = _lcm(lcm, hop) // lcm  # supercycles until hop alignment
    return k * d5, k * lcm


def res_fir_gate_step_init_state(batch: tuple, up: int, down: int,
                                 h_res, nfft: int, hop: int, taps: int,
                                 noise_frames: int, release: float, dtype,
                                 env_taps: int = 0):
    """res_hist (raw domain) + the FIR+gate step carry (resampled domain,
    in_tail carried in grid row layout).  env_taps >= 2 adds the folded
    envelope tail's rectified-row carry."""
    from audiosignalprocess_tpu.ops.resample import history_len

    n1, n2 = _grid_split(nfft)
    d = nfft - hop
    e0 = -(-(taps - 1) // n2) * n2
    hn = history_len(len(np.asarray(h_res)), up, down)
    st = dict(
        res_hist=jnp.zeros(batch + (hn,), dtype),
        in_tail=jnp.zeros(batch + ((d + e0) // n2, n2), dtype),
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


def res_fir_gate_step_fused(
    x: jnp.ndarray,
    state: dict,
    up: int,
    down: int,
    h_fir,
    h_res=None,
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
    """Fused streaming step: raw block -> resample(up/down) -> overlap-
    save FIR -> spectral gate, ONE Pallas kernel per block.

    == ResampleStage.step -> FIRGateStage.step composed (same carries in
    the resampled domain; the resampled signal never round-trips HBM).
    x is (batch..., b_in); b_in must be a multiple of the supercycle
    quantum D5 (res_step_geometry) with b_in*up/down a multiple of hop.
    ``input_latency``/``latency``/``state["pos"]`` are in RESAMPLED
    samples (the gate's domain), matching FIRGateStage.step.

    ``env_h`` folds the envelope-demod tail in too (|y| -> overlap-save
    FIR -> *env_scale, tail carried in ``state["env_tail"]``): the ENTIRE
    config-5 chain — resample + FIR + gate + envelope (BASELINE.json:11)
    — as ONE kernel per streaming block.
    """
    from audiosignalprocess_tpu.ops.resample import history_len

    g = gcd(up, down)
    up, down = up // g, down // g
    x = jnp.asarray(x)
    check_kernel_dtype(x.dtype)
    if h_res is None:
        h_res = oracle.resample_filter(up, down)
    h_res = np.asarray(h_res, dtype=np.float64)
    h = np.asarray(h_fir, dtype=np.float64)
    t = len(h)
    check(nfft % hop == 0 and nfft & (nfft - 1) == 0 and nfft > t - 1,
          "nfft must be a power of two multiple of hop, > taps-1")
    batch = x.shape[:-1]
    b_in = x.shape[-1]
    dt = x.dtype
    d = nfft - hop
    n1, n2 = _grid_split(nfft)
    check(hop % n2 == 0, f"hop {hop} not a multiple of the row width {n2}")
    lcm = _lcm(up, n2)
    r5 = lcm // n2
    c5 = lcm // up
    d5 = c5 * down
    check(b_in % d5 == 0 and b_in >= d5,
          f"block {b_in} not a multiple of the supercycle quantum {d5}")
    t5b = b_in // d5
    b_out = t5b * lcm
    check(b_out % hop == 0,
          f"resampled block {b_out} not a multiple of hop={hop}")
    m = b_out // hop
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

    xf = x.reshape((-1, b_in))
    bs = xf.shape[0]
    flat = lambda a: a.reshape((bs,) + a.shape[len(batch):])

    # ---- resampler windows: xin[tau*D5 : tau*D5 + W5p] per supercycle
    m5_np, base, w5 = _row_phase_matrices(tuple(h_res.tolist()), up, down, n2)
    w5p = -(-w5 // 128) * 128
    hn = history_len(len(h_res), up, down)
    check(-base == hn, "internal: phase-matrix base != -history_len")
    res_hist = flat(state["res_hist"])
    check(res_hist.shape[-1] == hn, f"res_hist must hold {hn} raw samples")
    need = (t5b - 1) * d5 + w5p
    xin = jnp.concatenate(
        [res_hist, xf,
         jnp.zeros((bs, max(0, need - hn - b_in)), dt)], axis=-1)
    v = jnp.stack([xin[:, tau * d5 : tau * d5 + w5p] for tau in range(t5b)],
                  axis=1)  # (bs, T5b, W5p)

    # ---- gate-side carries and masks (identical to fir_gate_step_fused)
    in_tail = flat(state["in_tail"])          # (bs, dr+e0r, n2) grid rows
    fifo_r, fifo_i = flat(state["gfifo_r"]), flat(state["gfifo_i"])
    floor_sum = flat(state["gfloor_sum"])
    ola_tail = flat(state["ola_tail"])
    # release state: minimal placeholder planes when smoothing is off
    rel = flat(state["grel"]) if release > 0.0 else jnp.zeros(
        (bs, 8, 128), dt)
    from audiosignalprocess_tpu.kernels.chain_kernel import (
        fir_gate_step_tables, gate_step_masks,
    )

    valid2, take2, take_f, inorm = gate_step_masks(
        state, m, b_out, d, hop, noise_frames, input_latency, latency,
        head_norm, const_norm, span_r, n2, dt, eof_in=eof_in,
        tail_norm=tail_norm)
    wgrid, tabs = fir_gate_step_tables(h, nfft, window_kind, n1, n2, dt,
                                       family="cfft")
    env = env_h is not None
    if env:
        from audiosignalprocess_tpu.kernels.chain_kernel import (
            envelope_step_geometry,
        )

        e0re, bre, nb_e, zpad_e, hegr, hegi = envelope_step_geometry(
            env_h, nfft, span_r, nr, n1, n2, dt)
        etail = flat(state["env_tail"])
        check(etail.shape[-2:] == (e0re, n2),
              f"env_tail must be {(e0re, n2)} rows, got {etail.shape[-2:]}")
    m5 = _m5_kernel_input(m5_np, r5, w5, w5p, dt)
    thresh_gain = float(10.0 ** (threshold_db / 20.0))
    att = float(10.0 ** (-reduction_db / 20.0))

    # VMEM-aware batch tile: resampled block frames, the noise_frames-deep
    # spectral FIFO (in/out/concat temporaries), the framing halo (+ the
    # envelope OS blocks when folded in)
    tb = int(min(batch_tile, bs,
                 vmem_tile_cap(
                     18 if env else 14,
                     (m + nfft // hop + noise_frames) * nfft,
                     dt.itemsize)))
    bp = -(-bs // tb) * tb
    pad_b = lambda a: jnp.pad(a, ((0, bp - bs),) + ((0, 0),) * (a.ndim - 1)) \
        if bp != bs else a
    v = pad_b(v)
    tail3 = pad_b(in_tail)
    ot3 = pad_b(ola_tail.reshape(bs, dr, n2))
    fifo_r, fifo_i = pad_b(fifo_r), pad_b(fifo_i)
    floor_sum, rel = pad_b(floor_sum), pad_b(rel)

    bs_b = lambda shp: pl.BlockSpec(
        (tb,) + shp[1:], (lambda i, _n=len(shp): (i,) + (0,) * (_n - 1)),
        memory_space=pltpu.VMEM)
    bs_c = lambda a: pl.BlockSpec(a.shape, (lambda i, _n=a.ndim: (0,) * _n),
                                  memory_space=pltpu.VMEM)
    tiled = [v, tail3, fifo_r, fifo_i, floor_sum, ot3, rel]
    if env:
        tiled.append(pad_b(etail))
    c2p, s2p = grid_post_tables(nfft, dt, (n1, n2), pre_tabs=tabs[:6])
    consts = ([valid2, take2, inorm, wgrid] + tabs
              + ([hegr, hegi] if env else []) + [c2p, s2p, m5])
    ins = tiled + consts
    in_specs = [bs_b(a.shape) for a in tiled] + [bs_c(a) for a in consts]
    out_shape = [jax.ShapeDtypeStruct((bp, span_r, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, noise_frames, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, n1, n2), dt),
                 jax.ShapeDtypeStruct((bp, dr, n2), dt),
                 jax.ShapeDtypeStruct(rel.shape, dt),  # placeholder-sized
                                                       # when release off
                 jax.ShapeDtypeStruct((bp, dr + e0r, n2), dt)]
    if env:
        out_shape.append(jax.ShapeDtypeStruct((bp, e0re, n2), dt))
    out_shape = tuple(out_shape)
    out_specs = tuple(bs_b(s.shape) for s in out_shape)
    if env:
        kern = functools.partial(
            _res_fir_gate_env_step_kernel, t5b, r5, m, hr, nr,
            dr, br, e0r, nb_os, zpad_r, n1, n2,
            float(noise_frames), thresh_gain, att, float(release),
            e0re, bre, nb_e, zpad_e, float(env_scale))
    else:
        kern = functools.partial(
            _res_fir_gate_step_kernel, t5b, r5, m, hr, nr,
            dr, br, e0r, nb_os, zpad_r, n1, n2,
            float(noise_frames), thresh_gain, att, float(release))
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
    y3, fro, fio, fso, oto, relo, tailo = outs[:7]

    unb = lambda a: a[:bs].reshape(batch + a.shape[1:])
    new_hist = jnp.concatenate([res_hist, xf], axis=-1)[..., -hn:]
    new_state = dict(
        res_hist=new_hist.reshape(batch + (hn,)),
        in_tail=unb(tailo),
        gfifo_r=unb(fro),
        gfifo_i=unb(fio),
        gfloor_sum=unb(fso),
        floor_n=(state["floor_n"]
                 + jnp.sum(take_f.astype(jnp.int32))).astype(jnp.int32),
        ola_tail=unb(oto).reshape(batch + (d,)),
        pos=(state["pos"] + b_out).astype(jnp.int32),
    )
    if release > 0.0:
        new_state["grel"] = unb(relo)
    if env:
        new_state["env_tail"] = unb(outs[7])
    y = unb(y3).reshape(batch + (b_out,))
    return new_state, y
