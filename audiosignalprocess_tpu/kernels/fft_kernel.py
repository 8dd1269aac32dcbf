"""Pallas TPU FFT kernels (SURVEY.md §2 rows 3-5; BASELINE.json:5 mandates
Pallas for the FFT inner loops).

Two kernels behind the same planar (real, imag) API:

- ``fft_fourstep``  — the PERFORMANCE path: Bailey four-step factorization
  N = N1*N2 run as two MXU matmuls + a VPU twiddle, entirely VMEM-resident
  per batch tile.  Batched audio FFTs are HBM-bound; this kernel reads and
  writes each element exactly once, so it runs at the memory roofline.
- ``fft_radix2_stages`` — the STRUCTURAL path: log2(N) butterfly stages
  (classic DIT, bit-reversed input) executed inside one kernel, data held
  in VMEM registers across all stages.  Capability parity with the C
  radix-2 loop; same VMEM-residency -> same roofline behavior.

Both operate on (batch, n) float32/float64 planes, grid over batch tiles.
``interpret`` mode (env ASP_INTERPRET_PALLAS=1) runs them on CPU for CI.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from audiosignalprocess_tpu.utils.validate import check


def _interpret() -> bool:
    return os.environ.get("ASP_INTERPRET_PALLAS", "0") == "1" or (
        jax.default_backend() != "tpu"
    )


def check_kernel_dtype(dtype) -> None:
    """TPU has no float64.  Compiling a fused kernel with f64 inputs would
    fail deep inside Mosaic (or silently downcast); fail clearly instead.
    Interpret mode (CPU / ASP_INTERPRET_PALLAS=1) supports f64 for tests."""
    if jnp.dtype(dtype) == jnp.float64 and not _interpret():
        raise ValueError(
            "float64 inputs to a fused Pallas kernel on TPU: the hardware "
            "has no f64 unit. Cast to float32, or run the jnp path "
            "(fused=False), or use interpret mode (ASP_INTERPRET_PALLAS=1) "
            "on CPU for float64 verification."
        )


def _split_n(n: int) -> tuple[int, int]:
    """Lane-preferred four-step split: n = n1 * n2 with n2 = min(128, n).

    n2 == the vreg lane width makes every row-space slice, DMA, and
    output block naturally 128-aligned (Mosaic's tiling constraint); the
    extra n1-side FLOPs vs a balanced split are free on the MXU for these
    HBM-bound kernels.
    """
    n2 = min(128, n)
    return n // n2, n2


def vmem_budget_bytes() -> int:
    """Per-grid-step VMEM working-set budget for the fused kernels.

    Default 48 MB: v5e VMEM is larger, but Mosaic accounts kernel
    temporaries conservatively (little buffer reuse across the unrolled
    four-step), so the analytic plane counts below need headroom.
    Override with ASP_VMEM_MB — lower it if a custom geometry hits a
    Mosaic VMEM-exceeded error, raise it after `tools/tune_tiles.py`
    confirms bigger tiles compile and win on the target chip."""
    return int(float(os.environ.get("ASP_VMEM_MB", "48")) * 1e6)


def vmem_tile_cap(live_planes: int, plane_elems: int, itemsize: int) -> int:
    """Max batch-tile rows whose working set fits the VMEM budget.

    ``live_planes`` is the kernel's analytic count of simultaneously-live
    (tile, plane_elems) buffers (per-kernel constants documented at each
    call site; calibrated so the shipped default geometries keep their
    measured tiles).  Rounded DOWN to a sublane multiple (8) and floored
    at 8 (one sublane tile): a non-multiple-of-8 tile both pads every
    batch to an odd multiple (wasted kernel work) and can land a ragged
    sublane dim on a 2D BlockSpec."""
    cap = vmem_budget_bytes() // (live_planes * plane_elems * itemsize)
    return max(8, (cap // 8) * 8)


def _batch_tile(n: int, dtype_bytes: int = 4) -> int:
    """Batch rows per grid step of the standalone FFT kernels (~24 live
    (tile, n) planes through the unrolled four-step; the 12 MiB base
    scales with ASP_VMEM_MB)."""
    base = int(12 * 1024 * 1024 * (vmem_budget_bytes() / 48e6))
    budget = base // (24 * n * dtype_bytes)
    return int(np.clip((budget // 8) * 8, 8, 64))


def _dot(a, b, dn, acc_dt):
    # HIGHEST is pinned: TPUs decompose f32 matmuls into bf16 passes by
    # default (~50 dB SNR — fails the 60 dB bound; measured in
    # docs/PERF.md), and Mosaic rejects Precision.HIGH.
    return jax.lax.dot_general(a, b, dimension_numbers=dn,
                               preferred_element_type=acc_dt,
                               precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# 3-pass bf16 f32-matmul emulation (ASP_MATMUL_MODE)
# ---------------------------------------------------------------------------
#
# HIGHEST costs 6 bf16 MXU passes per f32 matmul.  Splitting each operand
# into bf16 hi + lo halves (x = hi + lo exactly representable) and keeping
# the three significant products hi@Thi + hi@Tlo + lo@Thi costs 3 passes
# for ~16 mantissa bits (~90 dB SNR, comfortably over the 60 dB bound;
# dropping lo@Tlo loses only ~2^-16 relative).  The DFT tables are
# constants, so their hi/lo splits are precomputed on the host and stacked
# into one (2, n, n) bf16 kernel input; only the data side splits on the
# VPU.  Modes: "auto" (default: 3-pass for f32 on real TPU, HIGHEST in
# interpret/CPU and for f64), "bf16x3", "highest".


def _matmul_mode() -> str:
    m = os.environ.get("ASP_MATMUL_MODE", "auto")
    check(m in ("auto", "bf16x3", "highest"),
          f"ASP_MATMUL_MODE must be auto|bf16x3|highest, got {m!r}")
    return m


# Per-FAMILY precision pins: matmul families whose f32 path stays at
# Precision.HIGHEST even when the 3-pass bf16 emulation is the global
# mode.  Rationale: the composite step kernel's bf16x3 margin is the
# thinnest in the framework (77.6 dB on-chip, round-3 selfcheck), and
# the roadmap fix is to isolate WHICH matmul family eats it and pin
# that family selectively rather than paying HIGHEST (6 MXU passes)
# everywhere.  Families:
#   res  — polyphase/supercycle phase matrices (res_chain_kernel m5);
#          contraction dim W5 ≈ 600 for 160/147 × 64 taps, ~5× the FFT
#          grid's.  WHICH family's noise flips the gate is DATA-
#          dependent: +0.4 dB on the selfcheck seed (grid tables
#          dominate there) but +27 dB on the geomsweep-class seed
#          (88.0 → 115.0 with res pinned, grid pins inert) — so res
#          is in the DEFAULT pin set alongside cfftpre (measured cost
#          ~3 % of the composite step).
#   fft  — four-step grid n2-side DFT tables (grid_table_arrays c2/s2)
#          in EVERY fused kernel.  Measured: +14.1 dB on the composite
#          step (the gate's threshold comparison flips on borderline
#          bins under bf16x3 spectrum noise, and a flipped frame costs
#          far more SNR than the noise itself — the effect is strongly
#          input-dependent: 108 dB on one seed, 77.6 on the selfcheck
#          data, same code).
#   cfft — ALL the "fft" tables of the COMPOSITE res->FIR->gate
#          kernels (res_chain_kernel): every grid transform at HIGHEST
#          (measured 19.1 %/20.5 % of the composite streaming modes).
#   cfftpre — the DEFAULT: only the composite kernels' PRE-DECISION
#          transforms (OS-FIR forward + inverse, gate analysis
#          forward) at HIGHEST; the post-decision transforms (gate
#          synthesis inverse, envelope OS) stay on the 3-pass
#          emulation.  The gate-flip mechanism only cares about
#          spectrum accuracy AT the threshold comparison; post-
#          decision noise is a smooth ~109 dB/matmul floor.  Measured
#          on-chip: 114.7 dB on the selfcheck data (vs 122.1 full pin,
#          77.6 unpinned) at 11.4-12.9 % of the composite modes (vs
#          19.5-20.6 % full pin) — docs/PERF.md "composite margin".
#   gpre — the STANDALONE gate kernels' pre-decision tables (DEFAULT,
#          round 5): gate analysis forward in gate_kernel (whole-file,
#          shard, step) and FIR fwd+inv + gate analysis forward in
#          chain_kernel — the same decision-flip mechanism as cfftpre,
#          measured on these kernels at 86.6/89.7 dB rows and a
#          26 dB config-3 input swing (VERDICT r4 #3).  The synthesis
#          inverse (and the folded envelope tail) stay on the 3-pass
#          pair (family "gpost").
#   vfft — the VOCODER (stretch) kernel's ANALYSIS forward tables
#          (DEFAULT, round 5): the rotor phase recursion integrates its
#          input spectra's noise as a random walk, so bf16x3 analysis
#          noise (~3e-6/frame) costs ~26 dB of long-stream SNR at every
#          stream length (128-block soak: 76.1 dB unpinned vs 103.7
#          pinned on the CPU proxy — docs/PERF.md round-5 soak).  The
#          synthesis inverse adds flat per-frame noise only and stays
#          3-pass (family "vfft_post").
# ASP_MATMUL_PIN (comma list; "none" pins nothing, including the
# default) overrides for isolation A/Bs (tools/tpu_pin_ab.py).  The
# default and its measured SNR/throughput tradeoffs: docs/PERF.md
# "composite margin".
_PIN_DEFAULT = frozenset({"cfftpre", "res", "gpre", "vfft"})


def _matmul_pin() -> frozenset:
    p = os.environ.get("ASP_MATMUL_PIN")
    # empty/whitespace == unset: an env var that leaked in as "" from a
    # wrapper script must not silently drop the cfftpre default back
    # to the 77.6 dB thin-margin configuration — unpinning is only the
    # EXPLICIT "none"
    if p is None or not p.strip():
        return _PIN_DEFAULT
    fams = frozenset(f.strip() for f in p.split(",") if f.strip())
    allowed = {"res", "fft", "cfft", "cfftpre", "gpre", "vfft", "none"}
    check(fams <= allowed,
          f"ASP_MATMUL_PIN families must be one of {sorted(allowed)}, "
          f"got {p!r}")
    check("none" not in fams or len(fams) == 1,
          f"ASP_MATMUL_PIN 'none' cannot be combined with families: {p!r}")
    return frozenset() if fams == {"none"} else fams


# every family that names a grid c2/s2 table pair (the "fft" pin covers
# all of them; the narrower pins cover their own pre/post splits)
_GRID_FAMILIES = ("cfft", "cfft_post", "gpre", "gpost", "vfft", "vfft_post")


def _family_pinned(family: str, pins: frozenset) -> bool:
    """Pin-coverage relation: a broader pin covers the narrower family.
    "fft" covers everything grid-table; "cfft" covers both composite
    families (cfft + cfft_post); "cfftpre" covers only the pre-decision
    composite tables; "gpre"/"vfft" cover the standalone-gate / vocoder
    pre-decision tables.  The gpost/vfft_post partners are covered ONLY
    by the global "fft" pin (use ASP_MATMUL_MODE=highest for an
    everything-accurate experiment).
    (Scope note: the whole-file envelope FIRStage path that follows the
    whole-file composite kernel is family "fft", so a global-
    consistency experiment should use ASP_MATMUL_MODE=highest, not a
    pin.)"""
    if family in pins or ("fft" in pins and family in _GRID_FAMILIES):
        return True
    if family == "cfft" and "cfftpre" in pins:
        return True
    if family == "cfft_post" and "cfft" in pins:
        return True
    return False


def _use_bf16x3(dt, family: str | None = None) -> bool:
    if family is not None and _family_pinned(family, _matmul_pin()):
        return False
    m = _matmul_mode()
    if m == "bf16x3":
        return jnp.dtype(dt) == jnp.float32
    if m == "highest":
        return False
    return jnp.dtype(dt) == jnp.float32 and not _interpret()


def split_bf16_np(t: np.ndarray) -> np.ndarray:
    """Stacked (2, ...) bf16 hi/lo split of a float64 table, pure numpy
    (usable under jit tracing, unlike a jnp round trip)."""
    hi = np.asarray(t, np.float32).astype(jnp.bfloat16)
    lo = (np.asarray(t, np.float64) - np.asarray(hi, np.float64)).astype(
        np.float32).astype(jnp.bfloat16)
    return np.stack([np.asarray(hi), np.asarray(lo)])


def _tab(t: np.ndarray, dt, family: str = "fft"):
    """DFT-table kernel input: f32/f64 array, or the stacked (2, ...) bf16
    hi/lo split when the 3-pass emulation is active for this dtype (and
    the table's matmul ``family`` is not precision-pinned)."""
    if _use_bf16x3(dt, family):
        return jnp.asarray(split_bf16_np(t))
    return jnp.asarray(t, dt)


def _mm_pair(a, t1, t2, dn, acc_dt):
    """(a @ t1, a @ t2) sharing one hi/lo split of ``a``.

    t1/t2 are either plain f32/f64 tables (HIGHEST path) or (2, n, n) bf16
    hi/lo stacks (3-pass path; see _tab)."""
    if t1.dtype == jnp.bfloat16:
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(a.dtype)).astype(jnp.bfloat16)

        def d(p, q):
            return jax.lax.dot_general(p, q, dimension_numbers=dn,
                                       preferred_element_type=acc_dt)

        return (d(ah, t1[0]) + d(ah, t1[1]) + d(al, t1[0]),
                d(ah, t2[0]) + d(ah, t2[1]) + d(al, t2[0]))
    return _dot(a, t1, dn, acc_dt), _dot(a, t2, dn, acc_dt)


def _grid_split(n: int) -> tuple[int, int]:
    """(n1, n2) factorization used by the fused grid kernels.

    The lane width n2 trades VPU lane efficiency against n2-side MXU
    FLOPs: every elementwise/MAC op in the kernels runs on n2-wide
    vregs (n2=32 uses 1/4 of the 128 lanes), while the MXU contraction
    cost grows linearly in n2.  Since Mosaic overlaps the two units
    (measured: a matmul chain hides completely under VPU work), the
    optimum is workload-dependent — ``ASP_GRID_N2`` overrides the
    balanced default for tuning (see docs/PERF.md grid-split sweep)."""
    o = os.environ.get("ASP_GRID_N2")
    if o:
        n2 = int(o)
        check(n % n2 == 0 and n2 & (n2 - 1) == 0,
              f"ASP_GRID_N2={n2} must be a power-of-two divisor of {n}")
        if n2 < 128 and not _interpret():
            raise ValueError(
                f"ASP_GRID_N2={n2} < 128 cannot run on TPU hardware: "
                "row-space HBM arrays are 128-lane tiled and Mosaic "
                "cannot DMA-slice a narrower lane dim. Use n2 >= 128 "
                "(or interpret mode).")
        return n // n2, n2
    return _split_n(n)


def hbm_fetch_rows(rows: int, n2: int) -> int:
    """DMA row-window size for a row-space HBM fetch of ``rows`` rows.

    Arrays whose lane dim exceeds 128 are (8, 128)-tiled in HBM, so DMA
    slice sizes (and starts) along the row axis must be 8-aligned; at
    exactly 128 lanes the (1, 128) tiling imposes nothing.  Rounding the
    fetch up is harmless — kernels read only the rows they need — as
    long as the caller pads the source array to cover the largest fetch.
    (Row starts are the callers' span_r/s5 strides, kept 8-aligned by
    their own tile-count alignment.)"""
    return rows if n2 <= 128 else -(-rows // 8) * 8


@functools.lru_cache(maxsize=None)
def _grid_tables(n: int, n1: int, n2: int):
    """Positive-angle four-step tables: (c1, s1) (n1,n1), (c2, s2) (n2,n2),
    (tbc, tbs) twiddle grids laid out [b, c] (n2, n1)."""
    jk1 = 2.0 * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1
    jk2 = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2
    tw = 2.0 * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n
    return (np.cos(jk1), np.sin(jk1), np.cos(jk2), np.sin(jk2),
            np.cos(tw), np.sin(tw))


_MAC_MAX_N1 = 32  # unroll bound for the sublane-MAC n1-side DFT


def grid_table_arrays(n: int, dt, split: tuple[int, int] | None = None,
                      family: str = "fft"):
    """Positive-direction four-step tables as kernel-input arrays, with
    c2/s2 hi/lo bf16-split when the 3-pass emulation is active (_tab)
    and the caller's matmul ``family`` is not precision-pinned (the
    composite res->FIR->gate kernels pass family="cfft", pinned by
    default — see _PIN_DEFAULT).  Shared by every fused kernel that
    embeds the grid FFT.  ``split`` must match the (n1, n2) the calling
    kernel uses (default balanced)."""
    n1, n2 = split if split is not None else _split_n(n)
    c1_, s1_, c2_, s2_, tbc_, tbs_ = _grid_tables(n, n1, n2)
    if _use_lane_butterfly():
        # butterfly mode never reads the n2-side DFT tables (both
        # fourstep_grid_fwd and fourstep_grid_inv_real branch to
        # dft_lanes_butterfly before touching c2/s2), so pass minimal
        # (8, 128) placeholders instead of DMAing and pinning n2*n2
        # (x2 when bf16-split) dead bytes in every fused kernel's VMEM.
        ph = jnp.zeros((8, 128), dt)
        return [jnp.asarray(c1_, dt), jnp.asarray(s1_, dt), ph, ph,
                jnp.asarray(tbc_, dt), jnp.asarray(tbs_, dt)]
    return [jnp.asarray(c1_, dt), jnp.asarray(s1_, dt),
            _tab(c2_, dt, family), _tab(s2_, dt, family),
            jnp.asarray(tbc_, dt), jnp.asarray(tbs_, dt)]


def grid_post_tables(n: int, dt, split: tuple[int, int] | None = None,
                     pre_tabs=None, family: str = "cfft_post",
                     pre_family: str = "cfft"):
    """The POST-DECISION c2/s2 pair for the split-precision kernels
    (families "cfft_post" / "gpost" / "vfft_post"): under the default
    pins these stay on the 3-pass bf16 emulation while the pre-decision
    pair is f32/HIGHEST; under a covering pin (or highest mode /
    interpret / f64) both pairs are identical — pass ``pre_tabs`` (the
    grid_table_arrays result for ``pre_family``) to REUSE its c2/s2
    arrays in that case instead of building a duplicate host-side
    table / HBM buffer (each kernel operand still gets its own VMEM
    window).  Butterfly mode returns the same minimal placeholders as
    grid_table_arrays (the tables are never read)."""
    n1, n2 = split if split is not None else _split_n(n)
    if _use_lane_butterfly():
        ph = jnp.zeros((8, 128), dt)
        return [ph, ph]
    if pre_tabs is not None and \
            _use_bf16x3(dt, pre_family) == _use_bf16x3(dt, family):
        return [pre_tabs[2], pre_tabs[3]]
    _c1, _s1, c2_, s2_, _tc, _ts = _grid_tables(n, n1, n2)
    return [_tab(c2_, dt, family), _tab(s2_, dt, family)]


def tap_spectrum_grid(h, nfft: int, n1: int, n2: int, dt):
    """FIR tap spectrum as grid-layout kernel inputs: Hg[c, d] =
    FFT(h zero-padded to nfft)[n1*d + c], returned as [real, imag]
    (n1, n2) arrays.  Shared by every fused kernel that multiplies a
    spectrum by a tap response (overlap-save FIR, chain, envelope)."""
    h = np.asarray(h, np.float64)
    hf = np.fft.fft(np.concatenate([h, np.zeros(nfft - len(h))]))
    hg = hf.reshape(n2, n1).T
    return [jnp.asarray(hg.real.copy(), dt), jnp.asarray(hg.imag.copy(), dt)]


def _dft_sublane_mac(parts, coef, out_len):
    """DFT along a stacked sublane axis by unrolled scalar-MACs.

    parts: list of (real, imag|None) pairs, each (..., n2) full-lane;
    coef[a][c] = (cos, sin) scalars.  Returns [(yr_c, yi_c)] stacked lists.
    Runs entirely on the VPU at full lane width — the n1-side contraction
    is tiny (n1 <= 32), and an MXU dot here would both waste the systolic
    array (K = n1) and leave n1-wide (nearly empty) vregs as the minor dim.
    """
    outs = []
    for c in range(out_len):
        yr = None
        yi = None
        for a, (pr, pi) in enumerate(parts):
            cc, ss = coef[a][c]
            tr = pr * cc if cc != 0.0 else None
            if pi is not None and ss != 0.0:
                tr = (pi * ss) if tr is None else tr + pi * ss
            ti = None
            if pi is not None and cc != 0.0:
                ti = pi * cc
            if ss != 0.0:
                ti = (-(pr * ss)) if ti is None else ti - pr * ss
            yr = tr if yr is None else (yr if tr is None else yr + tr)
            yi = ti if yi is None else (yi if ti is None else yi + ti)
        outs.append((yr, yi))
    return outs


def _grid_fft_mode() -> str:
    """n2-side DFT implementation inside the fused grid kernels:
    "matmul" (K=n2 MXU contraction — ONE fused pass over the data, but
    ~n2/log2(n2) redundant FLOPs at bf16x3 ~109 dB) or "butterfly"
    (in-VMEM transpose + Stockham stages on sublanes — minimal FLOPs,
    zero MXU, exact f32 so fused-kernel SNR rises to 117-141 dB).
    "auto" = matmul: measured on-chip A/B (headline chain bench, two
    interleaved runs) puts matmul at 1.72e9 samples/s vs butterfly's
    1.26e9 — even with the MXU throttled to 4% of spec, the butterfly's
    per-stage VMEM relayout passes cost more than the redundant matmul
    FLOPs (docs/PERF.md grid-FFT A/B).  Unknown values raise."""
    m = os.environ.get("ASP_GRID_FFT", "auto")
    check(m in ("auto", "matmul", "butterfly"),
          f"ASP_GRID_FFT must be auto|matmul|butterfly, got {m!r}")
    return m


def _use_lane_butterfly() -> bool:
    return _grid_fft_mode() == "butterfly"


def dft_lanes_butterfly(zr, zi, sign):
    """Unnormalized DFT over the LANE (minor) axis of (..., C, n2) planar
    grids: transpose in VMEM so the transform sits on sublanes (all
    leading dims flatten into the lane batch — the wider the better for
    the VPU), run the Stockham butterfly stages, transpose back.  The
    butterfly replacement for the four-step's n2-side matmul: exact f32
    (no bf16 emulation) and no MXU work beyond the relayouts."""
    shp = zr.shape
    n2 = shp[-1]
    tr = jnp.swapaxes(zr.reshape(-1, n2), 0, 1)   # (n2, B)
    ti = jnp.swapaxes(zi.reshape(-1, n2), 0, 1)
    tr, ti = _stockham_stages(tr, ti, n2, sign)
    return (jnp.swapaxes(tr, 0, 1).reshape(shp),
            jnp.swapaxes(ti, 0, 1).reshape(shp))


def fourstep_grid_fwd(xr, xi, n1, n2, c1, s1, c2, s2, tbc, tbs):
    """Forward four-step FFT, grid in -> grid out: (..., n1, n2) planar
    [a, b] grids of x[a*n2+b] -> (..., n1, n2) grids G[..., c, d] =
    S[n1*d + c] (spectrum, unnormalized).

    Layout strategy (Mosaic cannot lane-reshape, and narrow-lane tensors
    kill VPU efficiency): the n1-side DFT runs as unrolled sublane MACs
    producing (..., c, b) with the FULL n2 lane width, the twiddle is an
    elementwise [c, b] grid multiply, and only the n2-side DFT — a
    K=n2 contraction, the shape the MXU is built for — is a dot_general.
    ``xi=None`` for real input (halves the MAC count).
    (c1, s1) are the POSITIVE-angle n1 DFT tables; forward conjugation is
    applied in here.  (tbc, tbs) are [b, c] twiddle grids (transposed
    in-place — they are small constants).
    """
    acc = xr.dtype
    if n1 > _MAC_MAX_N1:
        # large-n1 fallback: n1-side as a dot_general (correct but slower:
        # K=n1 MXU utilization + narrow-lane intermediates)
        dn1 = (((xr.ndim - 2,), (0,)), ((), ()))  # contract a
        yr = _dot(xr, c1, dn1, acc)               # (..., b, c)
        yi = -_dot(xr, s1, dn1, acc)
        if xi is not None:
            yr = yr + _dot(xi, s1, dn1, acc)
            yi = yi + _dot(xi, c1, dn1, acc)
        zr = yr * tbc + yi * tbs
        zi = yi * tbc - yr * tbs
        if _use_lane_butterfly():
            # fallback layout is (..., b, c): move the transform axis to
            # lanes first so the butterfly output matches the matmul's
            # (..., c, d) grid
            return dft_lanes_butterfly(jnp.swapaxes(zr, -1, -2),
                                       jnp.swapaxes(zi, -1, -2), -1.0)
        dn2 = (((zr.ndim - 2,), (0,)), ((), ()))  # contract b
        rc, rs = _mm_pair(zr, c2, s2, dn2, acc)
        ic, is_ = _mm_pair(zi, c2, s2, dn2, acc)
        return rc + is_, ic - rs
    parts = [(xr[..., a, :], None if xi is None else xi[..., a, :])
             for a in range(n1)]
    # _dft_sublane_mac multiplies by (cc - i*ss): positive-angle coef
    # tables give the forward e^{-i theta}
    coef = _np_coef(n1, sign=+1.0)
    zs = _dft_sublane_mac(parts, coef, n1)   # list of (..., b) pairs, index c
    # twiddle e^{-2pi i cb/n} row c, then stack -> (..., c, b)
    tcb_r = jnp.transpose(tbc)
    tcb_s = jnp.transpose(tbs)
    zr_rows = []
    zi_rows = []
    for c, (yr, yi) in enumerate(zs):
        tr = tcb_r[c]
        ts = tcb_s[c]
        if yi is None:
            zr_rows.append(yr * tr)
            zi_rows.append(-(yr * ts))
        else:
            zr_rows.append(yr * tr + yi * ts)
            zi_rows.append(yi * tr - yr * ts)
    zr = jnp.stack(zr_rows, axis=-2)  # (..., c, b) full-lane
    zi = jnp.stack(zi_rows, axis=-2)
    if _use_lane_butterfly():
        return dft_lanes_butterfly(zr, zi, -1.0)
    dn2 = (((zr.ndim - 1,), (0,)), ((), ()))   # contract b (lane, K=n2)
    rc, rs = _mm_pair(zr, c2, s2, dn2, acc)    # (..., c, d)
    ic, is_ = _mm_pair(zi, c2, s2, dn2, acc)
    return rc + is_, ic - rs


@functools.lru_cache(maxsize=None)
def _np_coef(n1: int, sign: float):
    """Scalar DFT coefficients coef[a][c] = (cos, sign*-sin ... ) — returns
    (cos, sin) of sign*2*pi*a*c/n1 as python floats (exact zeros kept)."""
    out = []
    for a in range(n1):
        row = []
        for c in range(n1):
            ang = sign * 2.0 * np.pi * ((a * c) % n1) / n1
            cc = float(np.cos(ang))
            ss = float(np.sin(ang))
            if abs(cc) < 1e-15:
                cc = 0.0
            if abs(ss) < 1e-15:
                ss = 0.0
            row.append((cc, ss))
        out.append(row)
    return out


def fourstep_grid_inv_real(pr, pi, n1, n2, c1, s1, c2, s2, tbc, tbs):
    """Inverse four-step from GRID spectrum (..., n1, n2) [c, d] back to the
    REAL signal in GRID layout (..., n1, n2) [a, b] of y[a*n2+b], scaled
    1/n.  Same layout strategy as fourstep_grid_fwd (sublane-MAC n1 side,
    MXU n2 side, full-lane intermediates)."""
    acc = pr.dtype
    n = n1 * n2
    if _use_lane_butterfly():
        # p @ (c2 + i*s2) == positive-sign DFT over the d lane axis
        ur, ui = dft_lanes_butterfly(pr, pi, 1.0)
    else:
        dn1 = (((pr.ndim - 1,), (0,)), ((), ()))  # contract d (lane, K=n2)
        rc, rs = _mm_pair(pr, c2, s2, dn1, acc)   # (..., c, b)
        ic, is_ = _mm_pair(pi, c2, s2, dn1, acc)
        ur = rc - is_
        ui = ic + rs
    # twiddle e^{+2pi i cb/n}: [c, b] grids = transposes of (tbc, tbs)
    tcb = jnp.transpose(tbc)
    tsb = jnp.transpose(tbs)
    vr = ur * tcb - ui * tsb
    vi = ui * tcb + ur * tsb
    if n1 > _MAC_MAX_N1:
        # large-n1 fallback: contract c by dot, minor-transpose to (a, b)
        nd = vr.ndim
        dn2 = (((nd - 2,), (0,)), ((), ()))
        wr = _dot(vr, c1, dn2, acc) - _dot(vi, s1, dn2, acc)   # (..., b, a)
        perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
        return jnp.transpose(wr, perm) * (1.0 / n)
    # n1-side inverse DFT (e^{+i...}) along the sublane c axis, real output
    coef = _np_coef(n1, sign=+1.0)
    rows = []
    for a in range(n1):
        yr = None
        for c in range(n1):
            cc, ss = coef[c][a]
            t = None
            if cc != 0.0:
                t = vr[..., c, :] * cc
            if ss != 0.0:
                t2 = vi[..., c, :] * ss
                t = -t2 if t is None else t - t2
            if t is not None:
                yr = t if yr is None else yr + t
        rows.append(yr)
    y3 = jnp.stack(rows, axis=-2)  # (..., a, b)
    return y3 * (1.0 / n)


def fourstep_grid_complex(xr, xi, n1, n2, c1, s1, c2, s2, tbc, tbs,
                          mac_sign: float = 1.0):
    """Complex four-step FFT, grid in -> grid out: (..., n1, n2) [a, b]
    grids -> (..., n2, n1) grids T[..., d, c] = S[n1*d + c] (the d-major
    grid whose XLA flatten is the natural-order spectrum).

    Full-lane formulation (same layout strategy as fourstep_grid_fwd):
    the n1-side DFT runs as unrolled sublane MACs at the full n2 lane
    width — the previous dot formulation left n1-wide (nearly empty)
    vregs as the minor dim of every intermediate, measured 3-4x slower on
    the VPU.  ``mac_sign`` selects the MAC direction (+1 forward e^{-i.},
    -1 inverse e^{+i.}); the twiddle/n2-side direction comes from the
    sin tables, pre-negated for the inverse by the caller.  Large n1
    falls back to the (narrow-lane but correct) dot formulation using
    the c1/s1 table inputs."""
    acc = xr.dtype
    nd = xr.ndim
    if n1 > _MAC_MAX_N1:
        dn1 = (((nd - 2,), (0,)), ((), ()))
        yr = _dot(xr, c1, dn1, acc) + _dot(xi, s1, dn1, acc)
        yi = _dot(xi, c1, dn1, acc) - _dot(xr, s1, dn1, acc)
        zr = yr * tbc + yi * tbs
        zi = yi * tbc - yr * tbs
        dn2 = (((nd - 2,), (0,)), ((), ()))
        rc, rs = _mm_pair(zr, c2, s2, dn2, acc)   # (..., c, d)
        ic, is_ = _mm_pair(zi, c2, s2, dn2, acc)
        wr, wi = rc + is_, ic - rs
        perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
        return jnp.transpose(wr, perm), jnp.transpose(wi, perm)
    parts = [(xr[..., a, :], xi[..., a, :]) for a in range(n1)]
    coef = _np_coef(n1, sign=mac_sign)
    zs = _dft_sublane_mac(parts, coef, n1)   # list of (..., b) pairs, idx c
    # twiddle rows [c, b]: multiply by (tr - i*ts); sign lives in tbs
    tcb_r = jnp.transpose(tbc)
    tcb_s = jnp.transpose(tbs)
    zr_rows = []
    zi_rows = []
    for c, (yr, yi) in enumerate(zs):
        tr = tcb_r[c]
        ts = tcb_s[c]
        zr_rows.append(yr * tr + yi * ts)
        zi_rows.append(yi * tr - yr * ts)
    zr = jnp.stack(zr_rows, axis=-2)  # (..., c, b) full-lane
    zi = jnp.stack(zi_rows, axis=-2)
    dn2 = (((zr.ndim - 1,), (0,)), ((), ()))   # contract b (lane, K=n2)
    rc, rs = _mm_pair(zr, c2, s2, dn2, acc)    # (..., c, d)
    ic, is_ = _mm_pair(zi, c2, s2, dn2, acc)
    wr, wi = rc + is_, ic - rs
    perm = tuple(range(nd - 2)) + (nd - 1, nd - 2)
    # minor (c, d) -> (d, c) transpose: grid T[d, c] flattens to natural order
    return jnp.transpose(wr, perm), jnp.transpose(wi, perm)


def _fourstep_kernel(n1, n2, mac_sign, xr_ref, xi_ref, c1, s1, c2, s2,
                     tbc, tbs, or_ref, oi_ref):
    or_ref[:], oi_ref[:] = fourstep_grid_complex(
        xr_ref[:], xi_ref[:], n1, n2,
        c1[:], s1[:], c2[:], s2[:], tbc[:], tbs[:], mac_sign=mac_sign,
    )


def fft_fourstep(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched complex FFT on (batch, n) planar real/imag.  Unnormalized.

    n must be a power of two >= 4.  Returns (yr, yi) same shape/dtype.
    """
    check(xr.ndim == 2 and xr.shape == xi.shape, 'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 4, 'guard failed: n & (n - 1) == 0 and n >= 4')
    check_kernel_dtype(xr.dtype)
    n1, n2 = _grid_split(n)
    dt = xr.dtype
    c1_, s1_, c2_, s2_, tbc_, tbs_ = _grid_tables(n, n1, n2)
    ss = 1.0 if sign < 0 else -1.0  # inverse = conjugate: negate sin grids
    tabs = [jnp.asarray(c1_, dt), jnp.asarray(ss * s1_, dt),
            _tab(c2_, dt), _tab(ss * s2_, dt),
            jnp.asarray(tbc_, dt), jnp.asarray(ss * tbs_, dt)]
    tb = min(_batch_tile(n, dt.itemsize), max(8, b))
    bp = -(-b // tb) * tb
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    # flat -> grid in XLA (free layout change); the kernel is grid-to-grid
    xr = xr.reshape(bp, n1, n2)
    xi = xi.reshape(bp, n1, n2)
    grid = (bp // tb,)
    bs_in = pl.BlockSpec((tb, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((tb, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bs_t = lambda a: pl.BlockSpec(a.shape, (lambda i: (0,) * a.ndim),
                                  memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_fourstep_kernel, n1, n2, ss),
        grid=grid,
        in_specs=[bs_in, bs_in] + [bs_t(t_) for t_ in tabs],
        out_specs=(bs_out, bs_out),
        out_shape=(jax.ShapeDtypeStruct((bp, n2, n1), dt),
                   jax.ShapeDtypeStruct((bp, n2, n1), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xr, xi, *tabs)
    return yr.reshape(bp, n)[:b], yi.reshape(bp, n)[:b]


# ---------------------------------------------------------------------------
# radix-2 stage kernel (structural path)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _stage_twiddles(n: int, sign: float):
    """Stacked per-stage twiddles, each tiled to length n/2: stage s has
    butterfly half-size m=2^s; tile its m twiddles n/(2m) times."""
    stages = n.bit_length() - 1
    cs = np.empty((stages, max(n // 2, 1)))
    sn = np.empty((stages, max(n // 2, 1)))
    for s in range(stages):
        m = 1 << s
        ang = sign * 2.0 * np.pi * np.arange(m) / (2 * m)
        cs[s] = np.tile(np.cos(ang), n // (2 * m))
        sn[s] = np.tile(np.sin(ang), n // (2 * m))
    return cs, sn


@functools.lru_cache(maxsize=None)
def _bitrev(n: int) -> np.ndarray:
    # single source of truth: the pinned oracle's bit-reversal convention
    from audiosignalprocess_tpu.cpu_ref.oracle import bit_reverse_indices

    return bit_reverse_indices(n)


def _radix2_kernel(n, xr_ref, xi_ref, twc_ref, tws_ref, or_ref, oi_ref):
    tb = xr_ref.shape[0]
    xr, xi = xr_ref[:], xi_ref[:]
    stages = n.bit_length() - 1
    for s in range(stages):
        m = 1 << s
        g = n // (2 * m)  # groups
        wc = twc_ref[s, :].reshape(g, m)[None]  # (1, g, m)
        ws = tws_ref[s, :].reshape(g, m)[None]
        ar = xr.reshape(tb, g, 2, m)
        ai = xi.reshape(tb, g, 2, m)
        er, ei = ar[:, :, 0, :], ai[:, :, 0, :]
        pr = ar[:, :, 1, :] * wc - ai[:, :, 1, :] * ws
        pi = ar[:, :, 1, :] * ws + ai[:, :, 1, :] * wc
        xr = jnp.concatenate([er + pr, er - pr], axis=-1).reshape(tb, n)
        xi = jnp.concatenate([ei + pi, ei - pi], axis=-1).reshape(tb, n)
    or_ref[:] = xr
    oi_ref[:] = xi


def fft_radix2_stages(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched radix-2 DIT FFT: bit-reversal permute (XLA gather) + all
    log2(n) butterfly stages in ONE Pallas kernel (VMEM-resident).

    STRUCTURAL path: mirrors the classic C in-place loop exactly.  Its
    stage reshapes split the lane dimension, which Mosaic cannot lower, so
    this kernel always runs through the Pallas interpreter (plain XLA ops)
    — on TPU hardware the butterfly structure lives in the four-step
    kernel's sublane-MAC stage instead (the performance path)."""
    check(xr.ndim == 2 and xr.shape == xi.shape, 'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 2, 'guard failed: n & (n - 1) == 0 and n >= 2')
    dt = xr.dtype
    rev = jnp.asarray(_bitrev(n))
    xr = jnp.take(xr, rev, axis=-1)
    xi = jnp.take(xi, rev, axis=-1)
    # normalize like the sibling kernels: sign selects the direction only
    # (a raw magnitude would scale the twiddle angles)
    twc_, tws_ = _stage_twiddles(n, -1.0 if sign < 0 else 1.0)
    twc, tws = jnp.asarray(twc_, dt), jnp.asarray(tws_, dt)
    tb = min(_batch_tile(n, dt.itemsize), max(8, b))
    bp = -(-b // tb) * tb
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    grid = (bp // tb,)
    bs_x = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_t = pl.BlockSpec(twc.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_radix2_kernel, n),
        grid=grid,
        in_specs=[bs_x, bs_x, bs_t, bs_t],
        out_specs=(bs_x, bs_x),
        out_shape=(jax.ShapeDtypeStruct((bp, n), dt), jax.ShapeDtypeStruct((bp, n), dt)),
        interpret=True,  # structural path: see docstring
    )(xr, xi, twc, tws)
    return yr[:b], yi[:b]


# ---------------------------------------------------------------------------
# radix-2 butterfly kernel, batch-in-lanes (TPU-compiled structural path)
# ---------------------------------------------------------------------------


def _radix2_lanes_kernel(n, sign, xr_ref, xi_ref, or_ref, oi_ref):
    """All log2(n) DIT butterfly stages on a (n, 128) batch-in-lanes tile.

    The classic in-place C loop vectorizes across the batch: data sits
    TRANSPOSED with the transform on the SUBLANE axis and 128 channels on
    lanes, so every stage's stride-m pairing is a sublane reshape/slice —
    legal in Mosaic for any m (only lane reshapes are banned) — and every
    butterfly runs at full lane width.  Twiddles are generated in-kernel
    from a sublane iota + cos/sin (a narrow (g, m, 1) transient; table
    inputs in this layout would waste 128x VMEM on 1-lane vregs).
    """
    xr = xr_ref[:]
    xi = xi_ref[:]
    L = xr.shape[-1]
    stages = n.bit_length() - 1
    for s in range(stages):
        m = 1 << s
        g = n // (2 * m)
        ar = xr.reshape(g, 2, m, L)
        ai = xi.reshape(g, 2, m, L)
        er, ei = ar[:, 0], ai[:, 0]
        our, oui = ar[:, 1], ai[:, 1]
        if m == 1:
            pr, pi = our, oui  # w = 1
        else:
            # Mosaic: iota must be integer-typed; cast for the angle math
            p = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1).astype(
                xr.dtype)
            ang = (sign * np.pi / m) * p
            wc = jnp.cos(ang)
            ws = jnp.sin(ang)
            pr = our * wc - oui * ws
            pi = our * ws + oui * wc
        xr = jnp.concatenate([er + pr, er - pr], axis=1).reshape(n, L)
        xi = jnp.concatenate([ei + pi, ei - pi], axis=1).reshape(n, L)
    or_ref[:] = xr
    oi_ref[:] = xi


def fft_radix2_lanes(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched radix-2 DIT FFT compiled for TPU: bit-reversal (XLA gather,
    fused with the batch transpose) + ALL butterfly stages in one Pallas
    kernel.  Structural parity with the classic C loop (same stage order,
    same twiddles), laid out batch-in-lanes (see _radix2_lanes_kernel).

    The (B, n) <-> (n, B) transposes cost one extra HBM pass each; the
    four-step kernel remains the performance path (BASELINE.json:5 names
    this kernel's butterflies; roofline.py reports both).
    """
    check(xr.ndim == 2 and xr.shape == xi.shape,
          'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 2, "power-of-two n >= 2 required")
    check_kernel_dtype(xr.dtype)
    dt = xr.dtype
    rev = jnp.asarray(_bitrev(n))
    # bit-reversal gather + transpose to batch-in-lanes in one XLA move
    xr_t = jnp.take(xr, rev, axis=-1).T  # (n, b)
    xi_t = jnp.take(xi, rev, axis=-1).T
    L = 128
    bp = -(-b // L) * L
    if bp != b:
        pad = ((0, 0), (0, bp - b))
        xr_t, xi_t = jnp.pad(xr_t, pad), jnp.pad(xi_t, pad)
    grid = (bp // L,)
    bs = pl.BlockSpec((n, L), lambda i: (0, i), memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_radix2_lanes_kernel, n, -1.0 if sign < 0 else 1.0),
        grid=grid,
        in_specs=[bs, bs],
        out_specs=(bs, bs),
        out_shape=(jax.ShapeDtypeStruct((n, bp), dt),
                   jax.ShapeDtypeStruct((n, bp), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xr_t, xi_t)
    return yr.T[:b], yi.T[:b]


# ---------------------------------------------------------------------------
# Stockham autosort kernel, batch-in-lanes (minimal-traffic butterfly path)
# ---------------------------------------------------------------------------


def _sk_radix() -> int:
    """Stockham stage radix: 8 / 4 / 2 composed radix-2 stages per full
    VMEM pass (same multiply count and stage ORDER in every mode — the
    result is a reassociation of the radix-2 recurrence, never a
    different algorithm).  The stage loop is pass-bound, not FLOP-bound:
    the kernel's ~170 GB/s ceiling measured round 4 was INVARIANT to
    chip-share slot and DMA tile size, so fewer materialized passes is
    the lever (docs/PERF.md "roofline, round 4").  ASP_SK_RADIX
    overrides for A/B."""
    r = int(os.environ.get("ASP_SK_RADIX", "4"))
    check(r in (2, 4, 8), f"ASP_SK_RADIX must be 2|4|8, got {r}")
    return r


def _sk_rows(n: int, itemsize: int) -> int:
    """Batch-tile rows per grid step for the lanes kernels (the lane
    width of the transposed in-VMEM planes).  The default stays 128:
    the round-4 sweep measured the kernel's GB/s ceiling INVARIANT to
    the tile size (128 vs 256 identical; docs/PERF.md "roofline,
    round 4"), so bigger tiles buy nothing here.  ASP_SK_ROWS
    overrides for A/B (multiple of 128), clamped to a conservative
    ~30 MB working-set budget (~6 full (rows, n) planes: in+out x2
    planes + stage temporaries) under the pallas_call's 100 MB
    vmem_limit_bytes — Mosaic accounts the unrolled stage temporaries
    well above the 6-plane analytic count, so an over-ask is reduced
    to the largest legal tile rather than failing at Mosaic compile
    (ASP_SK_ROWS=512 at n=4096 f32 was measured to blow the limit)."""
    o = os.environ.get("ASP_SK_ROWS")
    if not o:
        return 128
    r = int(o)
    check(r >= 128 and r % 128 == 0,
          f"ASP_SK_ROWS={r} must be a positive multiple of 128")
    # 30 MB working-set budget: caps n=4096 f32 at 256 rows (measured
    # compiling; 512 was measured to exceed the kernel's VMEM ceiling)
    cap = max((30 * 1024 * 1024 // (6 * n * itemsize)) // 128 * 128, 128)
    return min(r, cap)


def _sk_dimsem() -> tuple:
    """Grid dimension semantics for the batch-tiled lanes kernels.

    The batch grid is pure tiling — iterations are fully independent —
    so declaring it ``"parallel"`` is semantically true and frees
    Mosaic's inter-iteration scheduler from the sequential-carry
    assumption ``"arbitrary"`` implies when it pipelines the tile DMAs
    against the butterfly stages.  Round-4 data motivates the knob: the
    Stockham kernel's GB/s sat INVARIANT at ~170 while the DMA+transpose
    budget probe ran at ~225 — ~3 ms of VPU stage work per call was NOT
    hiding under the auto-pipelined DMA (docs/PERF.md "roofline,
    decomposed").  ASP_SK_DIMSEM=arbitrary restores the round-4 behavior
    for A/B (tools/tpu_overlap_ab.py)."""
    v = os.environ.get("ASP_SK_DIMSEM", "parallel")
    check(v in ("parallel", "arbitrary"),
          f"ASP_SK_DIMSEM must be parallel|arbitrary, got {v!r}")
    return (v,)


def _stockham_stages_r2(xr, xi, n, sign):
    """All log2(n) self-sorting Stockham butterfly stages on (n, L)
    sublane-major planes (transform on sublanes, batch on lanes).

    Stage t: A viewed (Lt, R, lanes); u = A[:, :R/2], v = A[:, R/2:]
    twiddled by w_{2Lt}^l; A' = concat([u+v, u-v]) -> (2Lt, R/2, lanes).
    Every reshape/slice is on the sublane axis (legal in Mosaic for any
    split); twiddles come from a sublane iota + cos/sin in-kernel.
    Shared by the complex kernel and the real-FFT pair below."""
    L = xr.shape[-1]
    stages = n.bit_length() - 1
    Lt, R = 1, n
    for _ in range(stages):
        h = R // 2
        ar = xr.reshape(Lt, R, L)
        ai = xi.reshape(Lt, R, L)
        ur, ui = ar[:, :h], ai[:, :h]
        vr, vi = ar[:, h:], ai[:, h:]
        if Lt > 1:
            l = jax.lax.broadcasted_iota(jnp.int32, (Lt, 1, 1), 0).astype(
                xr.dtype)
            ang = (sign * np.pi / Lt) * l
            wc = jnp.cos(ang)
            ws = jnp.sin(ang)
            vr, vi = vr * wc - vi * ws, vr * ws + vi * wc
        xr = jnp.concatenate([ur + vr, ur - vr], axis=0).reshape(n, L)
        xi = jnp.concatenate([ui + vi, ui - vi], axis=0).reshape(n, L)
        Lt, R = 2 * Lt, h
    return xr, xi


def _stockham_stages(xr, xi, n, sign):
    """Self-sorting Stockham stages, radix-4 with a radix-2 tail.

    Two consecutive radix-2 Stockham stages starting at view (Lt, R, L)
    compose exactly into one radix-4 stage: with quarters a0..a3 of the
    R axis and w = e^{sign*i*pi*l/(2*Lt)} (l the Lt index),

        e, f = a0 +- w^2 a2      g, h = a1 +- w^2 a3
        A' = concat([e + w g,  f + s w h,  e - w g,  f - s w h])

    (s = sign*i, a free real/imag swap).  Same multiply count as the
    radix-2 pair, HALF the full-array VMEM read/write passes — the
    stage loop is VMEM-bandwidth-bound, not FLOP-bound (docs/PERF.md).
    Stage order is unchanged, so the result is the radix-2 recurrence's
    bit-for-bit reassociation; the final stage falls back to radix-2
    when log2(n) is odd."""
    radix = _sk_radix()
    if radix == 2:
        return _stockham_stages_r2(xr, xi, n, sign)
    if radix == 8:
        return _stockham_stages_r8(xr, xi, n, sign)
    return _stages_r4_from(xr, xi, n, sign, 1, n)


def _stages_r4_from(xr, xi, n, sign, Lt, R):
    """Radix-4 Stockham passes from view (Lt, R, L) down to R == 1,
    with the radix-2 tail for odd remaining log2.  Shared by the
    radix-4 path (Lt=1, R=n) and the radix-8 loop's remainder."""
    L = xr.shape[-1]
    while R >= 4:
        q = R // 4
        ar = xr.reshape(Lt, R, L)
        ai = xi.reshape(Lt, R, L)
        a0r, a1r, a2r, a3r = (ar[:, k * q : (k + 1) * q] for k in range(4))
        a0i, a1i, a2i, a3i = (ai[:, k * q : (k + 1) * q] for k in range(4))
        if Lt > 1:
            l = jax.lax.broadcasted_iota(jnp.int32, (Lt, 1, 1), 0).astype(
                xr.dtype)
            th = (sign * np.pi / (2 * Lt)) * l
            wc, ws = jnp.cos(th), jnp.sin(th)
            w2c, w2s = jnp.cos(2.0 * th), jnp.sin(2.0 * th)
            t2r = a2r * w2c - a2i * w2s
            t2i = a2r * w2s + a2i * w2c
            t3r = a3r * w2c - a3i * w2s
            t3i = a3r * w2s + a3i * w2c
        else:
            t2r, t2i, t3r, t3i = a2r, a2i, a3r, a3i
        er, ei = a0r + t2r, a0i + t2i
        fr, fi = a0r - t2r, a0i - t2i
        gr, gi = a1r + t3r, a1i + t3i
        hr, hi = a1r - t3r, a1i - t3i
        if Lt > 1:
            wgr = gr * wc - gi * ws
            wgi = gr * ws + gi * wc
            # s*w*h with s = sign*i: (swh)_re = -sign*(wh)_im, etc.
            whr = hr * wc - hi * ws
            whi = hr * ws + hi * wc
        else:
            wgr, wgi, whr, whi = gr, gi, hr, hi
        swhr, swhi = (-whi, whr) if sign > 0 else (whi, -whr)
        xr = jnp.concatenate(
            [er + wgr, fr + swhr, er - wgr, fr - swhr], axis=0).reshape(n, L)
        xi = jnp.concatenate(
            [ei + wgi, fi + swhi, ei - wgi, fi - swhi], axis=0).reshape(n, L)
        Lt, R = 4 * Lt, q
    if R == 2:
        ar = xr.reshape(Lt, 2, L)
        ai = xi.reshape(Lt, 2, L)
        ur, ui = ar[:, :1], ai[:, :1]
        vr, vi = ar[:, 1:], ai[:, 1:]
        if Lt > 1:
            l = jax.lax.broadcasted_iota(jnp.int32, (Lt, 1, 1), 0).astype(
                xr.dtype)
            ang = (sign * np.pi / Lt) * l
            wc, ws = jnp.cos(ang), jnp.sin(ang)
            vr, vi = vr * wc - vi * ws, vr * ws + vi * wc
        xr = jnp.concatenate([ur + vr, ur - vr], axis=0).reshape(n, L)
        xi = jnp.concatenate([ui + vi, ui - vi], axis=0).reshape(n, L)
    return xr, xi


def _stockham_stages_r8(xr, xi, n, sign):
    """Radix-8 Stockham passes: THREE radix-2 stages composed per full
    VMEM pass (a radix-4 pass plus one more radix-2 stage carried in
    registers), remainder via _stages_r4_from.  Same multiply count and
    stage order as the radix-2 recurrence — a pure reassociation.

    Derivation of the in-register third stage: the radix-4 pass at view
    (Lt, R, L) leaves four blocks X_j (Lt, q, L), q = R/4, whose axis-0
    concat is the (4Lt, q, L) view of the next stage.  That stage's
    Stockham twiddle at index m = j*Lt + l factors as
        e^{sign*i*pi*m/(4Lt)} = W_j * wl,
        W_j = e^{sign*i*pi*j/4},  wl = e^{sign*i*pi*l/(4Lt)},
    so with u_j = X_j[:, :q/2], v_j = X_j[:, q/2:], tv_j = W_j*wl*v_j,
    the composed output order is
        [u_0+tv_0, .., u_3+tv_3, u_0-tv_0, .., u_3-tv_3]  -> (8Lt, q/2).
    W_j are compile-time constants (1, c45(1+si), si, c45(-1+si) with
    c45 = sqrt(2)/2 and s = sign), applied as real/imag shuffles."""
    L = xr.shape[-1]
    c45 = float(np.sqrt(0.5))
    Lt, R = 1, n
    while R >= 8:
        q = R // 4
        h2 = q // 2
        ar = xr.reshape(Lt, R, L)
        ai = xi.reshape(Lt, R, L)
        a0r, a1r, a2r, a3r = (ar[:, k * q : (k + 1) * q] for k in range(4))
        a0i, a1i, a2i, a3i = (ai[:, k * q : (k + 1) * q] for k in range(4))
        if Lt > 1:
            l = jax.lax.broadcasted_iota(jnp.int32, (Lt, 1, 1), 0).astype(
                xr.dtype)
            th = (sign * np.pi / (2 * Lt)) * l
            wc, ws = jnp.cos(th), jnp.sin(th)
            w2c, w2s = jnp.cos(2.0 * th), jnp.sin(2.0 * th)
            t2r = a2r * w2c - a2i * w2s
            t2i = a2r * w2s + a2i * w2c
            t3r = a3r * w2c - a3i * w2s
            t3i = a3r * w2s + a3i * w2c
        else:
            t2r, t2i, t3r, t3i = a2r, a2i, a3r, a3i
        er, ei = a0r + t2r, a0i + t2i
        fr, fi = a0r - t2r, a0i - t2i
        gr, gi = a1r + t3r, a1i + t3i
        hr, hi = a1r - t3r, a1i - t3i
        if Lt > 1:
            wgr = gr * wc - gi * ws
            wgi = gr * ws + gi * wc
            whr = hr * wc - hi * ws
            whi = hr * ws + hi * wc
        else:
            wgr, wgi, whr, whi = gr, gi, hr, hi
        swhr, swhi = (-whi, whr) if sign > 0 else (whi, -whr)
        # the four radix-4 outputs, kept in registers (never written to
        # a full (n, L) array)
        x4 = ((er + wgr, ei + wgi), (fr + swhr, fi + swhi),
              (er - wgr, ei - wgi), (fr - swhr, fi - swhi))
        # composed radix-2 stage: wl twiddle over the Lt axis
        if Lt > 1:
            thl = (sign * np.pi / (4 * Lt)) * l
            wlc, wls = jnp.cos(thl), jnp.sin(thl)
        plus, minus = [], []
        for j, (x4r, x4i) in enumerate(x4):
            ur_, ui_ = x4r[:, :h2], x4i[:, :h2]
            vr_, vi_ = x4r[:, h2:], x4i[:, h2:]
            if Lt > 1:
                br = vr_ * wlc - vi_ * wls
                bi = vr_ * wls + vi_ * wlc
            else:
                br, bi = vr_, vi_
            if j == 0:          # W_0 = 1
                tvr, tvi = br, bi
            elif j == 1:        # W_1 = c45 * (1 + sign*i)
                tvr = c45 * (br - sign * bi)
                tvi = c45 * (bi + sign * br)
            elif j == 2:        # W_2 = sign*i
                tvr, tvi = -sign * bi, sign * br
            else:               # W_3 = c45 * (-1 + sign*i)
                tvr = -c45 * (br + sign * bi)
                tvi = c45 * (sign * br - bi)
            plus.append((ur_ + tvr, ui_ + tvi))
            minus.append((ur_ - tvr, ui_ - tvi))
        both = plus + minus
        xr = jnp.concatenate([p[0] for p in both], axis=0).reshape(n, L)
        xi = jnp.concatenate([p[1] for p in both], axis=0).reshape(n, L)
        Lt, R = 8 * Lt, h2
    return _stages_r4_from(xr, xi, n, sign, Lt, R)


def _stockham_kernel(n, sign, xr_ref, xi_ref, or_ref, oi_ref):
    """All log2(n) Stockham butterfly stages on one (Lb, n) batch tile.

    Same batch-in-lanes idea as _radix2_lanes_kernel, plus two wins:
    - Stockham's constant-geometry stages are SELF-SORTING — no
      bit-reversal permutation exists anywhere (the lanes kernel needs an
      XLA gather pass for it).
    - the (batch, n) <-> (n, batch) transposes happen IN-KERNEL (MXU
      transpose of VMEM tiles), so HBM traffic is exactly one read and
      one write per plane — the memory-bound speed of light.
    """
    xr = jnp.swapaxes(xr_ref[:], 0, 1)  # (n, Lb)
    xi = jnp.swapaxes(xi_ref[:], 0, 1)
    xr, xi = _stockham_stages(xr, xi, n, sign)
    or_ref[:] = jnp.swapaxes(xr, 0, 1)
    oi_ref[:] = jnp.swapaxes(xi, 0, 1)


def fft_stockham_lanes(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched FFT via the self-sorting Stockham butterfly kernel.

    Natural order in and out, no XLA prep passes: the kernel reads the
    (batch, n) planes directly and transposes to lanes layout in VMEM.
    """
    check(xr.ndim == 2 and xr.shape == xi.shape,
          'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 2, "power-of-two n >= 2 required")
    check_kernel_dtype(xr.dtype)
    if _sk_pipe() == "manual" and not _interpret():
        # explicit multi-buffered DMA pipeline (the interpreter has no
        # DMA engines to overlap — interpret mode runs the grid form)
        return fft_stockham_manual(xr, xi, sign)
    dt = xr.dtype
    L = _sk_rows(n, np.dtype(dt).itemsize)
    bp = -(-b // L) * L
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    grid = (bp // L,)
    bs = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_stockham_kernel, n, -1.0 if sign < 0 else 1.0),
        grid=grid,
        in_specs=[bs, bs],
        out_specs=(bs, bs),
        out_shape=(jax.ShapeDtypeStruct((bp, n), dt),
                   jax.ShapeDtypeStruct((bp, n), dt)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=_sk_dimsem(),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xr, xi)
    return yr[:b], yi[:b]


# ---------------------------------------------------------------------------
# manually-pipelined Stockham variant (explicit multi-buffered DMA)
# ---------------------------------------------------------------------------
#
# Round-4 finding this attacks (docs/PERF.md "roofline, decomposed"): the
# auto-pipelined Stockham kernel sits INVARIANT at ~167 GB/s while its
# own DMA+transpose budget probe runs at ~98 % of the slot's achievable
# (~225) — about half of the VPU stage work is NOT hiding under the
# grid pipeline's tile DMAs, and neither tile size, stage radix, nor
# dimension_semantics moves it (overlap_ab_r05.json).  This variant
# takes the pipeline away from the auto-pipeliner: grid=(1,), input and
# output pinned in HBM, an explicit fori_loop over batch tiles with
# NBUF-deep in/out VMEM buffers and hand-placed async-copy start/wait
# pairs, so the butterfly stages of tile t run strictly between the
# start of tile t+NBUF-1's fetch and the wait on tile t's — the maximum
# overlap the DMA engines can give.  Selected by ASP_SK_PIPE=manual
# (A/B: tools/tpu_overlap_ab.py --manual); parity is pinned by the same
# tests as the grid kernel (the stages are the same code).

_SK_NBUF = 3


def _sk_pipe() -> str:
    v = os.environ.get("ASP_SK_PIPE", "auto")
    check(v in ("auto", "manual"),
          f"ASP_SK_PIPE must be auto|manual, got {v!r}")
    return v


def _stockham_manual_kernel(n, L, nt, nbuf, sign,
                            xr_hbm, xi_hbm, or_hbm, oi_hbm,
                            bufr, bufi, obufr, obufi,
                            isr, isi, osr, osi):
    def in_dma(slot, t):
        return (pltpu.make_async_copy(xr_hbm.at[pl.ds(t * L, L), :],
                                      bufr.at[slot], isr.at[slot]),
                pltpu.make_async_copy(xi_hbm.at[pl.ds(t * L, L), :],
                                      bufi.at[slot], isi.at[slot]))

    def out_dma(slot, t):
        return (pltpu.make_async_copy(obufr.at[slot],
                                      or_hbm.at[pl.ds(t * L, L), :],
                                      osr.at[slot]),
                pltpu.make_async_copy(obufi.at[slot],
                                      oi_hbm.at[pl.ds(t * L, L), :],
                                      osi.at[slot]))

    # warm-up: fill the buffer ring
    for w in range(min(nbuf, nt)):
        for d in in_dma(w, w):
            d.start()

    def body(t, _):
        slot = jax.lax.rem(t, nbuf)

        # the slot's previous OUTPUT copy must have drained before the
        # stages overwrite the buffer (t-nbuf wrote this slot)
        @pl.when(t >= nbuf)
        def _():
            for d in out_dma(slot, t - nbuf):
                d.wait()

        for d in in_dma(slot, t):
            d.wait()
        xr = jnp.swapaxes(bufr[slot], 0, 1)  # (n, L)
        xi = jnp.swapaxes(bufi[slot], 0, 1)
        yr, yi = _stockham_stages(xr, xi, n, sign)
        obufr[slot] = jnp.swapaxes(yr, 0, 1)
        obufi[slot] = jnp.swapaxes(yi, 0, 1)
        # tile t+nbuf reuses THIS slot, so its fetch may only start once
        # every read of bufr/bufi[slot] has retired.  The obufr/obufi
        # writes above data-depend on all of those reads, and Pallas
        # keeps ref mutations and DMA starts in program order — starting
        # the prefetch here (not before the stages) closes the window
        # where a sunk load could race the incoming copy.  With NBUF=3
        # the fetch still overlaps tiles t+1 and t+2's compute.
        @pl.when(t + nbuf < nt)
        def _():
            for d in in_dma(slot, t + nbuf):
                d.start()

        for d in out_dma(slot, t):
            d.start()
        return 0

    jax.lax.fori_loop(0, nt, body, 0)
    # drain the last nbuf output copies
    for w in range(min(nbuf, nt)):
        t = nt - min(nbuf, nt) + w
        for d in out_dma(t % nbuf, t):
            d.wait()


def fft_stockham_manual(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """fft_stockham_lanes with the explicit multi-buffered DMA pipeline
    (ASP_SK_PIPE=manual path; same stages, same layout contract)."""
    check(xr.ndim == 2 and xr.shape == xi.shape,
          'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 2, "power-of-two n >= 2 required")
    check_kernel_dtype(xr.dtype)
    dt = xr.dtype
    # the 4 NBUF-deep rings + the stage temporaries must fit the 100 MB
    # scoped-VMEM limit together: L=256 at n=4096 f32 was measured to
    # exceed it by 3.4 MB (Mosaic OOM at AOT), and L beyond 128 buys
    # nothing anyway (the grid kernel's measured tile invariance)
    L = min(_sk_rows(n, np.dtype(dt).itemsize), 128)
    bp = -(-b // L) * L
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    nt = bp // L
    nbuf = min(_SK_NBUF, nt)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    yr, yi = pl.pallas_call(
        functools.partial(_stockham_manual_kernel, n, L, nt, nbuf,
                          -1.0 if sign < 0 else 1.0),
        in_specs=[hbm, hbm],
        out_specs=(hbm, hbm),
        out_shape=(jax.ShapeDtypeStruct((bp, n), dt),
                   jax.ShapeDtypeStruct((bp, n), dt)),
        scratch_shapes=[
            pltpu.VMEM((nbuf, L, n), dt), pltpu.VMEM((nbuf, L, n), dt),
            pltpu.VMEM((nbuf, L, n), dt), pltpu.VMEM((nbuf, L, n), dt),
            pltpu.SemaphoreType.DMA((nbuf,)), pltpu.SemaphoreType.DMA((nbuf,)),
            pltpu.SemaphoreType.DMA((nbuf,)), pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xr, xi)
    return yr[:b], yi[:b]


# ---------------------------------------------------------------------------
# constant-geometry (Pease / Korn-Lambiotte) kernel: ROLLED stage loop
# ---------------------------------------------------------------------------


def _pease_kernel(n, sign, xr_ref, xi_ref, or_ref, oi_ref):
    """All log2(n) constant-geometry butterfly stages as ONE rolled
    ``lax.fori_loop`` on a (Lb, n) batch tile (compile-time path).

    Every stage has the IDENTICAL data flow — read the two sublane
    halves u = A[:n/2], v = A[n/2:], butterfly, write interleaved
    adjacent pairs (the Pease/Korn-Lambiotte constant-geometry form) —
    so the stage loop rolls into a single fori_loop body instead of the
    Stockham kernel's log2(n) UNROLLED bodies with per-stage view
    shapes: Mosaic traces and compiles ONE stage body (trace size O(1)
    in log n).  On-chip compile-time and throughput A/B vs the Stockham
    kernel: docs/KERNELS.md "Constant-geometry rolled kernel (Pease)".

    Stage s twiddle (derived by simulating the permutation flow of the
    natural-order DIF recurrence through the interleave writes — the
    closed form was validated against the oracle across all accepted n
    by the round-trip tests in tests/kernels/test_fft_kernel.py):

        w_s[k] = exp(sign * 2*pi*i * ((k >> s) << s) / n),  k in [0, n/2)

    computed in-kernel from a sublane iota (floor(k / 2^s) * 2^s — exact
    in f32 while k < 2^24, enforced by the wrapper's n <= 2^24 guard;
    every audio-scale n is far below it).  The loop's output is in
    BIT-REVERSED order; the wrapper undoes it with one XLA gather on the
    way out (same structure as fft_radix2_lanes).  Constant geometry and
    self-sorting are mutually exclusive for radix-2 (the riffle write is
    a bit-ROTATION, q of which compose to the identity, never to the bit
    REVERSAL), so the gather pass is inherent to the rolled form.
    """
    xr = jnp.swapaxes(xr_ref[:], 0, 1)  # (n, Lb): transform on sublanes
    xi = jnp.swapaxes(xi_ref[:], 0, 1)
    L = xr.shape[-1]
    h = n // 2
    k = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).astype(xr.dtype)
    base = sign * 2.0 * np.pi / n

    def body(s, carry):
        cr, ci = carry
        ur, ui = cr[:h], ci[:h]
        vr, vi = cr[h:], ci[h:]
        step = jnp.exp2(s.astype(cr.dtype))
        e = jnp.floor(k / step) * step  # (k >> s) << s, exact in f32
        ang = base * e
        wc, ws = jnp.cos(ang), jnp.sin(ang)
        t0r, t0i = ur + vr, ui + vi
        dr, di = ur - vr, ui - vi
        t1r = dr * wc - di * ws
        t1i = dr * ws + di * wc
        # interleave write out[2k] = t0[k], out[2k+1] = t1[k]: a sublane
        # stack + merge (never touches the lane axis)
        cr = jnp.stack([t0r, t1r], axis=1).reshape(n, L)
        ci = jnp.stack([t0i, t1i], axis=1).reshape(n, L)
        return cr, ci

    xr, xi = jax.lax.fori_loop(0, n.bit_length() - 1, body, (xr, xi))
    or_ref[:] = jnp.swapaxes(xr, 0, 1)
    oi_ref[:] = jnp.swapaxes(xi, 0, 1)


def fft_pease_lanes(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched FFT via the ROLLED constant-geometry butterfly kernel.

    Same layout contract as fft_stockham_lanes (natural order in and
    out, batch-in-lanes inside); the kernel's bit-reversed output is
    restored by one XLA gather on the way out.  This is the
    compile-time variant (ops.fft impl="pallas_cg"): one stage body
    compiles instead of log2(n), see _pease_kernel.
    """
    check(xr.ndim == 2 and xr.shape == xi.shape,
          'guard failed: xr.ndim == 2 and xr.shape == xi.shape')
    b, n = xr.shape
    check(n & (n - 1) == 0 and n >= 2, "power-of-two n >= 2 required")
    # the in-kernel twiddle exponent (k>>s)<<s is computed as
    # floor(k/2^s)*2^s on an f32 iota, exact only while k < 2^24
    check(n <= 1 << 24, "fft_pease_lanes supports n <= 2^24 (f32 iota "
          "twiddle-exponent exactness bound)")
    check_kernel_dtype(xr.dtype)
    dt = xr.dtype
    L = 128
    bp = -(-b // L) * L
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    grid = (bp // L,)
    bs = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_pease_kernel, n, -1.0 if sign < 0 else 1.0),
        grid=grid,
        in_specs=[bs, bs],
        out_specs=(bs, bs),
        out_shape=(jax.ShapeDtypeStruct((bp, n), dt),
                   jax.ShapeDtypeStruct((bp, n), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(xr, xi)
    # undo the loop's bit-reversed order (involution: take with rev)
    rev = jnp.asarray(_bitrev(n))
    return jnp.take(yr[:b], rev, axis=-1), jnp.take(yi[:b], rev, axis=-1)


# ---------------------------------------------------------------------------
# real-FFT Stockham kernels: pack + untangle fused IN-kernel
# ---------------------------------------------------------------------------
#
# ops.fft.rfft/irfft wrap a half-size complex FFT in XLA pack/untangle
# passes — each an extra HBM read+write around the kernel.  These kernels
# fuse the even/odd pack, the half-size Stockham FFT, and the untangle
# into ONE pallas_call: HBM traffic is exactly one read of the real plane
# and one write of the two half-spectrum planes (and vice versa for the
# inverse).  All pack/untangle ops land on the SUBLANE axis (the data is
# transposed in-VMEM first), so the stride-2 deinterleave that Mosaic
# bans on lanes is a legal sublane reshape here.  Conventions match
# ops.fft.rfft/irfft (oracle-pinned, SURVEY.md §2 row 5) bit-for-bit in
# structure: n/2+1 bins out, 1/N inverse scaling.


def _spec_pad(n: int) -> int:
    """Lane-aligned storage width for an n/2+1-bin half spectrum.

    A 2049-wide minor dim makes every (8, 128) tile straddle a boundary
    and the output DMA dominates (measured 10.7 ms vs 4.2 ms for the
    aligned complex kernel at n=4096) — so the kernels compute/store a
    zero-padded 128-multiple and the wrappers slice back."""
    return -(-(n // 2 + 1) // 128) * 128


def _rfft_sk_kernel(n, xr_ref, or_ref, oi_ref):
    half = n // 2
    nbp = _spec_pad(n)
    xt = jnp.swapaxes(xr_ref[:], 0, 1)        # (n, L) sublane-major
    v = xt.reshape(half, 2, xt.shape[-1])     # even/odd pack z = x0 + i x1
    zr, zi = _stockham_stages(v[:, 0], v[:, 1], half, -1.0)
    # untangle needs zkc[k] = conj(Z[(half-k) mod half]) — a sublane
    # REVERSAL, and Mosaic has no `rev` lowering.  Use the DFT identity
    # DFT_plus(z)[k] = Z[(-k) mod half] instead: a second butterfly pass
    # with sign=+1 yields the reversed spectrum directly (same total
    # FLOPs as a full-size complex FFT; HBM traffic unchanged).
    pr, pi = _stockham_stages(v[:, 0], v[:, 1], half, 1.0)
    # bins 0..half-1 on EXACTLY half (sublane-aligned) rows — arrays with
    # half+1 rows make every VPU op pay a remainder tile (measured ~2x on
    # the whole kernel); the Nyquist bin is a separate 1-row fixup below
    zkc_r = pr                                 # zkc[k] = conj(Z[half-k])
    zkc_i = -pi                                #        = conj(P[k])
    xe_r = 0.5 * (zr + zkc_r)
    xe_i = 0.5 * (zi + zkc_i)
    xo_r = 0.5 * (zi - zkc_i)                  # xo = -0.5i (zk - zkc)
    xo_i = -0.5 * (zr - zkc_r)
    k = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0).astype(xt.dtype)
    ang = (-2.0 * np.pi / n) * k               # w = e^{-2pi i k/n}
    wc = jnp.cos(ang)
    ws = jnp.sin(ang)
    sr = xe_r + wc * xo_r - ws * xo_i
    si = xe_i + wc * xo_i + ws * xo_r
    # S[half] = Re(Z[0]) - Im(Z[0]), purely real
    nyq = zr[:1] - zi[:1]
    zpad = jnp.zeros((nbp - half - 1, sr.shape[-1]), sr.dtype)
    or_ref[:] = jnp.swapaxes(jnp.concatenate([sr, nyq, zpad], axis=0), 0, 1)
    oi_ref[:] = jnp.swapaxes(
        jnp.concatenate([si, jnp.zeros_like(nyq), zpad], axis=0), 0, 1)


def rfft_stockham(x: jnp.ndarray):
    """Batched real FFT, (b, n) real -> ((b, n/2+1), (b, n/2+1)) planar.

    One fused kernel: even/odd pack + n/2 Stockham stages + untangle.
    n must be a power of two >= 4."""
    check(x.ndim == 2, 'guard failed: x.ndim == 2')
    b, n = x.shape
    check(n & (n - 1) == 0 and n >= 4, "power-of-two n >= 4 required")
    check_kernel_dtype(x.dtype)
    dt = x.dtype
    L = 128
    nbp = _spec_pad(n)
    bp = -(-b // L) * L
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0)))
    grid = (bp // L,)
    bs_in = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((L, nbp), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_rfft_sk_kernel, n),
        grid=grid,
        in_specs=[bs_in],
        out_specs=(bs_out, bs_out),
        out_shape=(jax.ShapeDtypeStruct((bp, nbp), dt),
                   jax.ShapeDtypeStruct((bp, nbp), dt)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x)
    return yr[:b, : n // 2 + 1], yi[:b, : n // 2 + 1]


def _irfft_sk_kernel(n, sr_ref, si_ref, o_ref):
    """Untangle + inverse pack without any runtime reversal.

    The classic untangle builds z[k] = a[k] zk[k] + c[k] conj(zk[half-k])
    (a = (1 + i w)/2, c = (1 - i w)/2, w = e^{2pi i k/n}) and inverse-
    transforms z — but Mosaic cannot reverse a sublane axis.  Substituting
    j = half-k inside IDFT(z) turns the runtime reversal into a STATIC
    one on the twiddle vector:

      IDFT(z) = DFT_plus(a .* zk[:half]) + DFT_minus(u)
      u[j] = c[half-j] conj(zk[j])  (j>=1),   u[0] = c[0] conj(zk[half])

    (the e^{2pi i (half-j) m / half} phase collapses to e^{-2pi i j m /
    half} exactly).  Both static vectors come from a sublane iota, so the
    kernel reads the spectrum exactly once and runs two half-size
    butterfly passes — same FLOPs as one full-size complex FFT."""
    half = n // 2
    zk_r = jnp.swapaxes(sr_ref[:], 0, 1)      # (nbp, L); rows 0..half live
    zk_i = jnp.swapaxes(si_ref[:], 0, 1)
    dtype = zk_r.dtype
    k = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0).astype(dtype)
    th = (np.pi / half) * k                    # i*w = -sin + i cos
    sn = jnp.sin(th)
    cs = jnp.cos(th)
    ar = 0.5 * (1.0 - sn)                      # a = (1 + i w)/2
    ai = 0.5 * cs
    zr, zi = zk_r[:half], zk_i[:half]
    z1r = ar * zr - ai * zi
    z1i = ar * zi + ai * zr
    t1r, t1i = _stockham_stages(z1r, z1i, half, 1.0)
    # g[j] = c[half-j] = (1 + sin(pi j/half) + i cos(pi j/half))/2
    gr = 0.5 * (1.0 + sn)
    gi = 0.5 * cs
    ur = gr * zr + gi * zi                     # g .* conj(zk)
    ui = gi * zr - gr * zi
    # row 0 is the folded Nyquist term c[0] conj(zk[half]), c[0] = (1-i)/2.
    # Replace via an aligned select — an offset-1 concat would force every
    # downstream op onto misaligned sublane tiles.
    u0r = 0.5 * zk_r[half : half + 1] - 0.5 * zk_i[half : half + 1]
    u0i = -0.5 * zk_r[half : half + 1] - 0.5 * zk_i[half : half + 1]
    row0 = jax.lax.broadcasted_iota(jnp.int32, (half, 1), 0) == 0
    ur = jnp.where(row0, u0r, ur)
    ui = jnp.where(row0, u0i, ui)
    t2r, t2i = _stockham_stages(ur, ui, half, -1.0)
    scale = 1.0 / half
    out = jnp.stack([t1r + t2r, t1i + t2i], axis=1).reshape(n, zr.shape[-1])
    o_ref[:] = jnp.swapaxes(out * scale, 0, 1)


def irfft_stockham(sr: jnp.ndarray, si: jnp.ndarray, n: int):
    """Batched inverse real FFT, planar (b, n/2+1) spectrum -> (b, n) real
    (1/N scaling).  One fused kernel: untangle + two n/2 butterfly passes
    + re/im interleave.  n must be a power of two >= 4."""
    check(sr.ndim == 2 and sr.shape == si.shape,
          'guard failed: sr.ndim == 2 and sr.shape == si.shape')
    b, nb = sr.shape
    check(n & (n - 1) == 0 and n >= 4, "power-of-two n >= 4 required")
    check(nb == n // 2 + 1, "spectrum must have n/2+1 bins")
    check_kernel_dtype(sr.dtype)
    dt = sr.dtype
    L = 128
    nbp = _spec_pad(n)
    bp = -(-b // L) * L
    pad = ((0, bp - b), (0, nbp - nb))  # lane-align the minor dim too
    sr, si = jnp.pad(sr, pad), jnp.pad(si, pad)
    grid = (bp // L,)
    bs_in = pl.BlockSpec((L, nbp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_out = pl.BlockSpec((L, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        functools.partial(_irfft_sk_kernel, n),
        grid=grid,
        in_specs=[bs_in, bs_in],
        out_specs=bs_out,
        out_shape=jax.ShapeDtypeStruct((bp, n), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(sr, si)
    return y[:b]


# ---------------------------------------------------------------------------
# complex-array adapter (plugs into ops.fft._IMPLS)
# ---------------------------------------------------------------------------


def _flat2(x: jnp.ndarray):
    """(..., n) -> (B, n) view + unflatten fn."""
    shape = x.shape
    return x.reshape((-1, shape[-1])), lambda y: y.reshape(shape[:-1] + (y.shape[-1],))


def fft_complex(x: jnp.ndarray, sign: float, core=fft_fourstep) -> jnp.ndarray:
    """Complex-in/complex-out adapter over the planar Pallas kernels."""
    n = x.shape[-1]
    if n < 4:
        # tiny sizes: direct DFT is fine (and fourstep needs n>=4)
        k = jnp.arange(n)
        w = jnp.exp(sign * 2j * jnp.pi * jnp.outer(k, k) / n).astype(x.dtype)
        return jnp.einsum("...a,ak->...k", x, w,
                          precision=jax.lax.Precision.HIGHEST)
    xf, unflat = _flat2(x)
    rdt = jnp.float64 if x.dtype == jnp.complex128 else jnp.float32
    yr, yi = core(jnp.real(xf).astype(rdt), jnp.imag(xf).astype(rdt), sign)
    return unflat((yr + 1j * yi).astype(x.dtype))
