"""Randomized-parameter sweeps across the fused kernels (seeded, so
deterministic in CI): random tap counts, FFT sizes, hops, lengths, and
batch shapes, all oracle-checked."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused
from audiosignalprocess_tpu.kernels.os_kernel import overlap_save_fused
from audiosignalprocess_tpu.kernels.resample_kernel import resample_mac

def _cases_os(k):
    rng = np.random.default_rng(2026)
    out = []
    for _ in range(k):
        nfft = int(2 ** rng.integers(8, 13))
        taps = int(rng.integers(2, max(3, nfft // 2)))
        n = int(rng.integers(nfft, 6 * nfft))
        b = int(rng.integers(1, 5))
        out.append((taps, nfft, n, b))
    return out


@pytest.mark.parametrize("taps,nfft,n,b", _cases_os(8))
def test_overlap_save_fuzz(taps, nfft, n, b):
    rng = np.random.default_rng(taps * 1000 + n)
    x = rng.standard_normal((b, n))
    h = rng.standard_normal(taps)
    ref = np.stack([oracle.fir_direct(x[i], h) for i in range(b)])
    out = np.asarray(overlap_save_fused(x, h, nfft, blocks_per_step=3))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)


def _cases_gate(k):
    rng = np.random.default_rng(2027)
    out = []
    # every combo satisfies hop % row_width == 0 (row width = min(128, nfft))
    combos = [(256, 128), (512, 128), (512, 256), (1024, 256),
              (1024, 512), (2048, 512)]
    for _ in range(k):
        nfft, hop = combos[rng.integers(0, len(combos))]
        nf = int(rng.integers(24, 80))
        n = nfft + (nf - 1) * hop + int(rng.integers(0, hop))
        out.append((nfft, hop, n))
    return out


@pytest.mark.parametrize("nfft,hop,n", _cases_gate(6))
def test_gate_fuzz(nfft, hop, n):
    rng = np.random.default_rng(nfft + n)
    x = 0.01 * rng.standard_normal((2, n))
    lo, hi = n // 3, 2 * (n // 3)
    x[:, lo:hi] += np.sin(np.arange(hi - lo))
    ref = np.stack([oracle.noise_gate(x[c], nfft=nfft, hop=hop) for c in range(2)])
    out = np.asarray(noise_gate_fused(x, nfft=nfft, hop=hop, frames_per_step=8))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-9)


def _cases_rs(k):
    rng = np.random.default_rng(2028)
    out = []
    for _ in range(k):
        up = int(rng.integers(1, 24))
        down = int(rng.integers(1, 24))
        if up == down:
            down += 1
        # ragged tails on purpose: n NOT a multiple of down exercises the
        # partial final polyphase cycle (nout = ceil(n*up/down))
        n = int(rng.integers(40, 120)) * down + int(rng.integers(0, down))
        out.append((up, down, n))
    return out


@pytest.mark.parametrize("zp", (True, False), ids=("zero_phase", "causal"))
@pytest.mark.parametrize("up,down,n", _cases_rs(8))
def test_resample_fuzz(up, down, n, zp):
    rng = np.random.default_rng(up * 100 + down)
    x = rng.standard_normal((2, n))
    ref = np.stack([
        oracle.resample_poly(x[i], up, down, zero_phase=zp) for i in range(2)
    ])
    out = np.asarray(resample_mac(x, up, down, zero_phase=zp, cycle_tile=32))
    np.testing.assert_allclose(out, ref, rtol=1e-8, atol=1e-8)
