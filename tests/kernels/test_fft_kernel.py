"""Pallas FFT kernel tests (interpret mode on CPU, SURVEY.md §4.2)."""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels import fft_kernel
from audiosignalprocess_tpu.ops import fft as fft_ops

CORES = (fft_kernel.fft_fourstep, fft_kernel.fft_radix2_stages)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(23)


class TestPlanarCores:
    @pytest.mark.parametrize("core", CORES, ids=("fourstep", "radix2"))
    @pytest.mark.parametrize("n", (4, 64, 512, 1024, 4096))
    def test_forward_f32(self, rng, core, n):
        if core is fft_kernel.fft_radix2_stages and n < 4:
            pytest.skip("tiny")
        b = 24
        xr = rng.standard_normal((b, n)).astype(np.float32)
        xi = rng.standard_normal((b, n)).astype(np.float32)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        yr, yi = core(xr, xi, -1.0)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert oracle.snr_db(np.abs(ref), np.abs(got)) >= 60.0
        err = np.abs(ref - got)
        assert 10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(err**2)) >= 60.0

    @pytest.mark.parametrize("core", CORES, ids=("fourstep", "radix2"))
    def test_inverse_roundtrip(self, rng, core):
        n, b = 1024, 8
        xr = rng.standard_normal((b, n)).astype(np.float32)
        xi = rng.standard_normal((b, n)).astype(np.float32)
        yr, yi = core(xr, xi, -1.0)
        zr, zi = core(np.asarray(yr), np.asarray(yi), 1.0)
        np.testing.assert_allclose(np.asarray(zr) / n, xr, atol=2e-3)
        np.testing.assert_allclose(np.asarray(zi) / n, xi, atol=2e-3)

    @pytest.mark.parametrize("core", CORES, ids=("fourstep", "radix2"))
    def test_f64(self, rng, core):
        n, b = 256, 8
        xr = rng.standard_normal((b, n))
        xi = rng.standard_normal((b, n))
        ref = np.fft.fft(xr + 1j * xi)
        yr, yi = core(xr, xi, -1.0)
        np.testing.assert_allclose(np.asarray(yr) + 1j * np.asarray(yi), ref,
                                   rtol=1e-9, atol=1e-9)

    def test_batch_padding(self, rng):
        """Batch not a multiple of the tile is padded and trimmed exactly."""
        n = 256
        for b in (1, 3, 9, 100):
            xr = rng.standard_normal((b, n)).astype(np.float32)
            xi = np.zeros((b, n), np.float32)
            yr, yi = fft_kernel.fft_fourstep(xr, xi, -1.0)
            assert yr.shape == (b, n)
            ref = np.fft.fft(xr.astype(np.float64))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            assert oracle.snr_db(np.abs(ref) + 1e-30, np.abs(got) + 1e-30) >= 60.0


class TestImplRegistry:
    """The pallas impls plug into the ops.fft API and match the oracle."""

    @pytest.mark.parametrize("impl", ("pallas", "pallas_r2"))
    @pytest.mark.parametrize("n", (64, 1024))
    def test_fft_api(self, rng, impl, n):
        x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))).astype(
            np.complex64
        )
        ref = np.fft.fft(x.astype(np.complex128))
        out = np.asarray(fft_ops.fft(x, impl=impl))
        err = np.abs(ref - out)
        assert 10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(err**2)) >= 60.0

    @pytest.mark.parametrize("impl", ("pallas", "pallas_r2"))
    def test_rfft_irfft_api(self, rng, impl):
        x = rng.standard_normal((4, 1024)).astype(np.float32)
        ref = np.fft.rfft(x.astype(np.float64))
        out = np.asarray(fft_ops.rfft(x, impl=impl))
        err = np.abs(ref - out)
        assert 10 * np.log10(np.sum(np.abs(ref) ** 2) / np.sum(err**2)) >= 60.0
        back = np.asarray(fft_ops.irfft(out, 1024, impl=impl))
        assert oracle.snr_db(x.astype(np.float64), back) >= 60.0

    def test_overlap_save_with_pallas(self, rng):
        from audiosignalprocess_tpu.ops.overlap_save import overlap_save

        x = rng.standard_normal(8192).astype(np.float32)
        h = oracle.design_fir(64, 0.25)
        ref = oracle.fir_direct(x.astype(np.float64), h)
        out = np.asarray(overlap_save(x, h, 1024, impl="pallas"))
        assert oracle.snr_db(ref, out) >= 60.0


class TestBf16x3Emulation:
    """3-pass bf16 f32-matmul emulation (ASP_MATMUL_MODE=bf16x3): the
    TPU perf mode, ~109 dB SNR in interpret mode — well over the 60 dB
    bound (docs/PERF.md precision study)."""

    @pytest.mark.parametrize("n", (1024, 4096))
    def test_fourstep_bf16x3_snr(self, rng, monkeypatch, n):
        monkeypatch.setenv("ASP_MATMUL_MODE", "bf16x3")
        import jax.numpy as jnp
        from audiosignalprocess_tpu.kernels.fft_kernel import fft_fourstep

        xr = rng.standard_normal((8, n)).astype(np.float32)
        xi = rng.standard_normal((8, n)).astype(np.float32)
        yr, yi = fft_fourstep(jnp.asarray(xr), jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.concatenate([np.asarray(yr), np.asarray(yi)]).astype(np.float64)
        want = np.concatenate([ref.real, ref.imag])
        assert oracle.snr_db(want, got) >= 95.0

    def test_fused_gate_bf16x3_snr(self, rng, monkeypatch):
        monkeypatch.setenv("ASP_MATMUL_MODE", "bf16x3")
        from audiosignalprocess_tpu.kernels.gate_kernel import noise_gate_fused

        x = rng.standard_normal((2, 16384)).astype(np.float32)
        out = np.asarray(noise_gate_fused(x, 1024, 256, noise_frames=8))
        ref = np.stack([oracle.noise_gate(x[c].astype(np.float64), 1024, 256)
                        for c in range(2)])
        assert oracle.snr_db(ref, out.astype(np.float64)) >= 80.0


class TestRadix2Lanes:
    """Batch-in-lanes butterfly kernel (TPU-compilable structural path):
    all stages sublane-axis ops, twiddles from in-kernel iota+cos/sin."""

    @pytest.mark.parametrize("n", (8, 256, 1024, 4096))
    def test_forward_inverse(self, rng, n):
        import jax.numpy as jnp

        xr = rng.standard_normal((5, n)).astype(np.float32)
        xi = rng.standard_normal((5, n)).astype(np.float32)
        yr, yi = fft_kernel.fft_radix2_lanes(jnp.asarray(xr),
                                             jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real, got.imag])) >= 100.0
        zr, zi = fft_kernel.fft_radix2_lanes(yr, yi, +1.0)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        assert oracle.snr_db(
            np.concatenate([xr, xi]).astype(np.float64),
            np.concatenate([back.real, back.imag])) >= 100.0

    def test_impl_registry(self, rng):
        x = rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))
        got = np.asarray(fft_ops.fft(x.astype(np.complex64), impl="pallas_r2"))
        ref = np.fft.fft(x)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real.astype(np.float64),
                            got.imag.astype(np.float64)])) >= 100.0


class TestStockhamLanes:
    """Self-sorting Stockham kernel (impl="pallas_sk"): the perf path.
    The stage radix (ASP_SK_RADIX: 2/4/8 composed radix-2 stages per
    VMEM pass) and the batch-tile rows (ASP_SK_ROWS) are pure
    reassociations/tilings — parity must hold across the whole matrix,
    including sizes where the radix-8 loop leaves every remainder class
    (R in {1, 2, 4} after the last full pass)."""

    @pytest.mark.parametrize("radix", ("2", "4", "8"))
    @pytest.mark.parametrize("n", (8, 64, 128, 256, 1024))
    def test_forward_inverse_radix(self, rng, monkeypatch, radix, n):
        import jax.numpy as jnp

        monkeypatch.setenv("ASP_SK_RADIX", radix)
        xr = rng.standard_normal((5, n)).astype(np.float32)
        xi = rng.standard_normal((5, n)).astype(np.float32)
        yr, yi = fft_kernel.fft_stockham_lanes(jnp.asarray(xr),
                                               jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real, got.imag])) >= 100.0
        zr, zi = fft_kernel.fft_stockham_lanes(yr, yi, +1.0)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        assert oracle.snr_db(
            np.concatenate([xr, xi]).astype(np.float64),
            np.concatenate([back.real, back.imag])) >= 100.0

    def test_rows_tile_ragged_batch(self, rng, monkeypatch):
        import jax.numpy as jnp

        monkeypatch.setenv("ASP_SK_ROWS", "256")
        xr = rng.standard_normal((300, 128)).astype(np.float32)  # pads to 512
        xi = rng.standard_normal((300, 128)).astype(np.float32)
        yr, yi = fft_kernel.fft_stockham_lanes(jnp.asarray(xr),
                                               jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert got.shape == (300, 128)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real, got.imag])) >= 100.0

    def test_rows_validation(self, monkeypatch):
        import jax.numpy as jnp

        monkeypatch.setenv("ASP_SK_ROWS", "100")
        with pytest.raises(ValueError, match="ASP_SK_ROWS"):
            fft_kernel.fft_stockham_lanes(
                jnp.zeros((2, 64), np.float32),
                jnp.zeros((2, 64), np.float32), -1.0)

    @pytest.mark.parametrize("batch", (100, 300))
    def test_manual_pipeline_parity(self, rng, batch):
        """fft_stockham_manual (the explicit multi-buffered DMA form,
        ASP_SK_PIPE=manual on hardware): same layout contract and
        parity as the grid form, including ragged batches that pad to
        fewer tiles than the buffer ring depth (batch=100 -> nt=1 <
        NBUF) and to a partial final tile (batch=300 -> nt=3).  The
        interpreter executes the async copies/semaphores, so the ring
        logic itself is covered in CI; throughput is the on-chip A/B
        (docs/records/overlap_manual_r05.json)."""
        import jax.numpy as jnp

        xr = rng.standard_normal((batch, 256)).astype(np.float32)
        xi = rng.standard_normal((batch, 256)).astype(np.float32)
        yr, yi = fft_kernel.fft_stockham_manual(jnp.asarray(xr),
                                                jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert got.shape == (batch, 256)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real, got.imag])) >= 100.0

    def test_pipe_validation(self, monkeypatch):
        monkeypatch.setenv("ASP_SK_PIPE", "bogus")
        with pytest.raises(ValueError, match="ASP_SK_PIPE"):
            fft_kernel._sk_pipe()


class TestPeaseLanes:
    """Rolled constant-geometry (Pease/Korn-Lambiotte) kernel: one
    fori_loop stage body + XLA bit-reversal restore — the compile-time
    variant of the Stockham kernel (kernels/fft_kernel._pease_kernel)."""

    @pytest.mark.parametrize("n", (8, 256, 1024, 4096))
    def test_forward_inverse(self, rng, n):
        import jax.numpy as jnp

        xr = rng.standard_normal((5, n)).astype(np.float32)
        xi = rng.standard_normal((5, n)).astype(np.float32)
        yr, yi = fft_kernel.fft_pease_lanes(jnp.asarray(xr),
                                            jnp.asarray(xi), -1.0)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real, got.imag])) >= 100.0
        zr, zi = fft_kernel.fft_pease_lanes(yr, yi, +1.0)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        assert oracle.snr_db(
            np.concatenate([xr, xi]).astype(np.float64),
            np.concatenate([back.real, back.imag])) >= 100.0

    def test_matches_stockham_exactly_in_structure(self, rng):
        # same contract as fft_stockham_lanes: natural order in and out
        import jax.numpy as jnp

        n = 512
        xr = rng.standard_normal((3, n)).astype(np.float32)
        xi = rng.standard_normal((3, n)).astype(np.float32)
        pr, pi = fft_kernel.fft_pease_lanes(jnp.asarray(xr),
                                            jnp.asarray(xi), -1.0)
        sr, si = fft_kernel.fft_stockham_lanes(jnp.asarray(xr),
                                               jnp.asarray(xi), -1.0)
        ref = np.concatenate([np.asarray(sr), np.asarray(si)])
        got = np.concatenate([np.asarray(pr), np.asarray(pi)])
        assert oracle.snr_db(ref.astype(np.float64),
                             got.astype(np.float64)) >= 110.0

    def test_impl_registry(self, rng):
        x = rng.standard_normal((3, 512)) + 1j * rng.standard_normal((3, 512))
        got = np.asarray(fft_ops.fft(x.astype(np.complex64), impl="pallas_cg"))
        ref = np.fft.fft(x)
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag]),
            np.concatenate([got.real.astype(np.float64),
                            got.imag.astype(np.float64)])) >= 100.0


class TestRfftStockham:
    """Dedicated real-FFT Stockham kernels: even/odd pack + half-size
    butterflies + untangle in ONE pallas_call (kernels/fft_kernel.py)."""

    @pytest.mark.parametrize("n", (4, 256, 1024, 4096))
    def test_rfft_vs_numpy(self, rng, n):
        import jax.numpy as jnp

        for b in (1, 5, 130):
            x = rng.standard_normal((b, n)).astype(np.float32)
            yr, yi = fft_kernel.rfft_stockham(jnp.asarray(x))
            assert yr.shape == (b, n // 2 + 1)
            got = np.asarray(yr) + 1j * np.asarray(yi)
            ref = np.fft.rfft(x.astype(np.float64))
            assert oracle.snr_db(
                np.concatenate([ref.real, ref.imag]),
                np.concatenate([got.real.astype(np.float64),
                                got.imag.astype(np.float64)])) >= 100.0

    @pytest.mark.parametrize("n", (8, 1024))
    def test_irfft_roundtrip(self, rng, n):
        import jax.numpy as jnp

        x = rng.standard_normal((9, n)).astype(np.float32)
        yr, yi = fft_kernel.rfft_stockham(jnp.asarray(x))
        back = np.asarray(fft_kernel.irfft_stockham(yr, yi, n))
        assert oracle.snr_db(x.astype(np.float64), back) >= 100.0

    def test_ops_api_routing(self, rng):
        """impl="pallas_sk" on the ops API hits the fused real kernels and
        matches the oracle convention (batched, any leading shape)."""
        x = rng.standard_normal((2, 3, 1024)).astype(np.float32)
        s = np.asarray(fft_ops.rfft(x, impl="pallas_sk"))
        ref = np.fft.rfft(x.astype(np.float64))
        assert oracle.snr_db(
            np.concatenate([ref.real, ref.imag], axis=None),
            np.concatenate([s.real.astype(np.float64),
                            s.imag.astype(np.float64)], axis=None)) >= 100.0
        y = np.asarray(fft_ops.irfft(s, 1024, impl="pallas_sk"))
        assert oracle.snr_db(x.astype(np.float64), y) >= 100.0

    def test_guards(self, rng):
        import jax.numpy as jnp
        import pytest as _pt

        with _pt.raises(ValueError):
            fft_kernel.rfft_stockham(jnp.zeros((2, 48), np.float32))  # not 2^k
        with _pt.raises(ValueError):
            fft_kernel.irfft_stockham(jnp.zeros((2, 5), np.float32),
                                      jnp.zeros((2, 5), np.float32), 16)
