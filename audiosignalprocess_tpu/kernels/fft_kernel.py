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


def _interpret() -> bool:
    return os.environ.get("ASP_INTERPRET_PALLAS", "0") == "1" or (
        jax.default_backend() != "tpu"
    )


def _split_n(n: int) -> tuple[int, int]:
    k = n.bit_length() - 1
    return 1 << (k // 2), 1 << (k - k // 2)


@functools.lru_cache(maxsize=None)
def _tables_fourstep(n: int, sign: float):
    """(F1 cos/sin, F2 cos/sin, twiddle cos/sin) float64 design-time."""
    n1, n2 = _split_n(n)
    jk1 = np.outer(np.arange(n1), np.arange(n1))
    jk2 = np.outer(np.arange(n2), np.arange(n2))
    cb = np.outer(np.arange(n1), np.arange(n2))
    a1 = sign * 2.0 * np.pi * jk1 / n1
    a2 = sign * 2.0 * np.pi * jk2 / n2
    at = sign * 2.0 * np.pi * cb / n
    return (
        np.cos(a1), np.sin(a1),
        np.cos(a2), np.sin(a2),
        np.cos(at), np.sin(at),
    )


def _batch_tile(n: int, dtype_bytes: int = 4) -> int:
    """Batch rows per grid step: keep ~6 (tile, n) planes under ~12 MB VMEM."""
    budget = 12 * 1024 * 1024 // (6 * n * dtype_bytes)
    return int(np.clip((budget // 8) * 8, 8, 512))


def fourstep_planar_val(xr, xi, n1, n2, f1c, f1s, f2c, f2s, twc, tws):
    """Four-step FFT on VALUES (usable inside any kernel): (..., n) planar
    in, (..., n) planar out, n = n1*n2.  Sign is baked into the tables
    (negate the sin tables for the inverse; no 1/N scaling here)."""
    batch = xr.shape[:-1]
    n = n1 * n2
    xr = xr.reshape((-1, n1, n2))
    xi = xi.reshape((-1, n1, n2))
    acc_dt = xr.dtype
    dn_l = (((1,), (1,)), ((), ()))  # F1[c,a] . X[t,a,b] -> (c,t,b)

    def dot(a, b, dn):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=acc_dt,
                                   precision=jax.lax.Precision.HIGHEST)

    yr = dot(f1c, xr, dn_l) - dot(f1s, xi, dn_l)
    yi = dot(f1c, xi, dn_l) + dot(f1s, xr, dn_l)
    # twiddle: (c,t,b) * (c,1,b)
    tc = twc[:, None, :]
    ts = tws[:, None, :]
    zr = yr * tc - yi * ts
    zi = yr * ts + yi * tc
    dn_r = (((2,), (0,)), ((), ()))  # Z[c,t,b] . F2[b,d] -> (c,t,d)
    wr = dot(zr, f2c, dn_r) - dot(zi, f2s, dn_r)
    wi = dot(zr, f2s, dn_r) + dot(zi, f2c, dn_r)
    # out[t, d*n1 + c] -> transpose (c,t,d) -> (t,d,c) -> (t, n)
    or_ = jnp.transpose(wr, (1, 2, 0)).reshape(batch + (n,))
    oi_ = jnp.transpose(wi, (1, 2, 0)).reshape(batch + (n,))
    return or_, oi_


def _fourstep_kernel(n1, n2, xr_ref, xi_ref, f1c, f1s, f2c, f2s, twc, tws, or_ref, oi_ref):
    or_ref[:], oi_ref[:] = fourstep_planar_val(
        xr_ref[:], xi_ref[:], n1, n2,
        f1c[:], f1s[:], f2c[:], f2s[:], twc[:], tws[:],
    )


def fft_fourstep(xr: jnp.ndarray, xi: jnp.ndarray, sign: float):
    """Batched complex FFT on (batch, n) planar real/imag.  Unnormalized.

    n must be a power of two >= 4.  Returns (yr, yi) same shape/dtype.
    """
    assert xr.ndim == 2 and xr.shape == xi.shape
    b, n = xr.shape
    assert n & (n - 1) == 0 and n >= 4
    n1, n2 = _split_n(n)
    dt = xr.dtype
    t1c, t1s, t2c, t2s, twc, tws = (
        jnp.asarray(t, dt) for t in _tables_fourstep(n, sign)
    )
    tb = min(_batch_tile(n, dt.itemsize), max(8, b))
    bp = -(-b // tb) * tb
    if bp != b:
        pad = ((0, bp - b), (0, 0))
        xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
    grid = (bp // tb,)
    bs_x = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bs_t = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    yr, yi = pl.pallas_call(
        functools.partial(_fourstep_kernel, n1, n2),
        grid=grid,
        in_specs=[bs_x, bs_x, bs_t((n1, n1)), bs_t((n1, n1)),
                  bs_t((n2, n2)), bs_t((n2, n2)), bs_t((n1, n2)), bs_t((n1, n2))],
        out_specs=(bs_x, bs_x),
        out_shape=(jax.ShapeDtypeStruct((bp, n), dt), jax.ShapeDtypeStruct((bp, n), dt)),
        interpret=_interpret(),
    )(xr, xi, t1c, t1s, t2c, t2s, twc, tws)
    return yr[:b], yi[:b]


@functools.lru_cache(maxsize=None)
def _pack_tables(n: int):
    """rfft untangle / irfft re-tangle twiddles for length-n real FFTs."""
    half = n // 2
    ang = -2.0 * np.pi * np.arange(half + 1) / n
    return np.cos(ang), np.sin(ang)  # wb = conj(wf): negate sin


def rfft_planar_val(x, n1, n2, f1c, f1s, f2c, f2s, twc, tws, wfc, wfs):
    """Value-level real FFT via half-size packed complex four-step.

    x: (..., n) real (n = 2*n1*n2); returns (Sr, Si) each (..., n//2+1).
    Tables: four-step FORWARD tables for n//2, plus (wfc, wfs) from
    _pack_tables(n).
    """
    half = x.shape[-1] // 2
    xv = x.reshape(x.shape[:-1] + (half, 2))
    zr, zi = xv[..., 0], xv[..., 1]
    zfr, zfi = fourstep_planar_val(zr, zi, n1, n2, f1c, f1s, f2c, f2s, twc, tws)
    zkr = jnp.concatenate([zfr, zfr[..., :1]], axis=-1)
    zki = jnp.concatenate([zfi, zfi[..., :1]], axis=-1)
    zkcr = zkr[..., ::-1]
    zkci = -zki[..., ::-1]
    xer = 0.5 * (zkr + zkcr)
    xei = 0.5 * (zki + zkci)
    xor_ = 0.5 * (zki - zkci)
    xoi = -0.5 * (zkr - zkcr)
    sr = xer + wfc * xor_ - wfs * xoi
    si = xei + wfc * xoi + wfs * xor_
    return sr, si


def irfft_planar_val(sr, si, n1, n2, if1c, if1s, if2c, if2s, itwc, itws, wfc, wfs):
    """Value-level inverse real FFT (1/N scaling): (..., n//2+1) planar
    spectrum -> (..., n) real.  Tables: four-step INVERSE tables for n//2
    (sin-negated forward tables), plus the SAME (wfc, wfs) from
    _pack_tables(n) — the re-tangle conjugate is formed in here."""
    half = sr.shape[-1] - 1
    srr = sr[..., ::-1]
    sii = si[..., ::-1]
    xer = 0.5 * (sr + srr)
    xei = 0.5 * (si - sii)
    dr = 0.5 * (sr - srr)
    di = 0.5 * (si + sii)
    # xo = d * conj(wf)  (wback = exp(+2pi i k/n) = conj(wf))
    xor_ = dr * wfc + di * wfs
    xoi = -dr * wfs + di * wfc
    zr = (xer - xoi)[..., :half]
    zi = (xei + xor_)[..., :half]
    tr, ti = fourstep_planar_val(zr, zi, n1, n2, if1c, if1s, if2c, if2s, itwc, itws)
    scale = 1.0 / half
    out = jnp.stack([tr * scale, ti * scale], axis=-1)
    return out.reshape(sr.shape[:-1] + (2 * half,))


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
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


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
    log2(n) butterfly stages in ONE Pallas kernel (VMEM-resident)."""
    assert xr.ndim == 2 and xr.shape == xi.shape
    b, n = xr.shape
    assert n & (n - 1) == 0 and n >= 2
    dt = xr.dtype
    rev = jnp.asarray(_bitrev(n))
    xr = jnp.take(xr, rev, axis=-1)
    xi = jnp.take(xi, rev, axis=-1)
    twc_, tws_ = _stage_twiddles(n, sign)
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
        interpret=_interpret(),
    )(xr, xi, twc, tws)
    return yr[:b], yi[:b]


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
    if n < 4 or core is fft_fourstep and n < 4:
        # tiny sizes: direct DFT is fine (and fourstep needs n>=4)
        k = jnp.arange(n)
        w = jnp.exp(sign * 2j * jnp.pi * jnp.outer(k, k) / n).astype(x.dtype)
        return jnp.einsum("...a,ak->...k", x, w,
                          precision=jax.lax.Precision.HIGHEST)
    xf, unflat = _flat2(x)
    rdt = jnp.float64 if x.dtype == jnp.complex128 else jnp.float32
    yr, yi = core(jnp.real(xf).astype(rdt), jnp.imag(xf).astype(rdt), sign)
    return unflat((yr + 1j * yi).astype(x.dtype))
