"""ASP_MATMUL_PIN per-family precision pins (round-4 composite-margin
isolation, docs/ROADMAP.md "Performance" / docs/PERF.md "composite
margin").

The 3-pass bf16 emulation (ASP_MATMUL_MODE) is a GLOBAL mode; the pins
keep a named matmul FAMILY at f32/HIGHEST underneath it so the on-chip
A/B can isolate which family eats the composite step's SNR margin.
These tests pin the plumbing: the pin switches the table dtype handed
to the kernels (which is what the kernel bodies branch on), parity
holds either way, and bad values are rejected.  Interpret mode
(conftest) with ASP_MATMUL_MODE=bf16x3 forced so the pin has something
to override.
"""

import numpy as np
import pytest

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.kernels import fft_kernel
from audiosignalprocess_tpu.kernels.res_chain_kernel import _m5_kernel_input


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


def test_pin_validation(monkeypatch):
    monkeypatch.setenv("ASP_MATMUL_PIN", "bogus")
    with pytest.raises(ValueError, match="ASP_MATMUL_PIN"):
        fft_kernel._matmul_pin()


def test_pin_switches_table_dtype(monkeypatch):
    import jax.numpy as jnp

    monkeypatch.setenv("ASP_MATMUL_MODE", "bf16x3")
    t = np.linspace(-1, 1, 16).reshape(4, 4)

    monkeypatch.setenv("ASP_MATMUL_PIN", "none")
    assert fft_kernel._tab(t, np.float32, "fft").dtype == jnp.bfloat16
    m5 = _m5_kernel_input(np.zeros((2, 4, 4)), 2, 4, 8, np.float32)
    assert m5.dtype == jnp.bfloat16

    monkeypatch.setenv("ASP_MATMUL_PIN", "fft")
    assert fft_kernel._tab(t, np.float32, "fft").dtype == jnp.float32
    m5 = _m5_kernel_input(np.zeros((2, 4, 4)), 2, 4, 8, np.float32)
    assert m5.dtype == jnp.bfloat16  # fft pin leaves res family split

    monkeypatch.setenv("ASP_MATMUL_PIN", "res")
    assert fft_kernel._tab(t, np.float32, "fft").dtype == jnp.bfloat16
    m5 = _m5_kernel_input(np.zeros((2, 4, 4)), 2, 4, 8, np.float32)
    assert m5.dtype == jnp.float32

    # "none" must stand alone (a mixed list is a config error, not a
    # silent un-pin), and an empty/whitespace value is treated as UNSET
    # (the default pins stay active) — only the explicit "none" unpins
    monkeypatch.setenv("ASP_MATMUL_PIN", "res,none")
    with pytest.raises(ValueError, match="combined"):
        fft_kernel._matmul_pin()
    monkeypatch.setenv("ASP_MATMUL_PIN", "")
    assert fft_kernel._matmul_pin() == fft_kernel._PIN_DEFAULT
    monkeypatch.setenv("ASP_MATMUL_PIN", "  ")
    assert fft_kernel._matmul_pin() == fft_kernel._PIN_DEFAULT
    monkeypatch.setenv("ASP_MATMUL_PIN", "none")
    assert fft_kernel._matmul_pin() == frozenset()


def test_composite_default_pin(monkeypatch):
    """The composite kernels' PRE-decision grid tables ("cfft") are
    pinned by DEFAULT via the "cfftpre" pin (the measured gate-flip
    margin), while the post-decision pair ("cfft_post") and the shared
    "fft" family stay on the 3-pass emulation; the broader "cfft" and
    "fft" pins cover the post pair too; an explicit "none" unpins
    everything including the default."""
    import jax.numpy as jnp

    monkeypatch.setenv("ASP_MATMUL_MODE", "bf16x3")
    t = np.linspace(-1, 1, 16).reshape(4, 4)

    monkeypatch.delenv("ASP_MATMUL_PIN", raising=False)
    # default: pre-decision grid tables (composite, standalone gate,
    # vocoder analysis) AND the resample phase matrices pinned (which
    # family flips the gate is data-dependent; the vocoder's recursion
    # integrates analysis noise — docs/PERF.md rounds 4-5)
    assert fft_kernel._matmul_pin() == frozenset(
        {"cfftpre", "res", "gpre", "vfft"})
    assert fft_kernel._tab(t, np.float32, "cfft").dtype == jnp.float32
    assert fft_kernel._tab(t, np.float32, "cfft_post").dtype == jnp.bfloat16
    assert fft_kernel._tab(t, np.float32, "fft").dtype == jnp.bfloat16
    assert fft_kernel._tab(t, np.float32, "gpre").dtype == jnp.float32
    assert fft_kernel._tab(t, np.float32, "gpost").dtype == jnp.bfloat16
    assert fft_kernel._tab(t, np.float32, "vfft").dtype == jnp.float32
    assert fft_kernel._tab(t, np.float32, "vfft_post").dtype == jnp.bfloat16
    assert not fft_kernel._use_bf16x3(np.float32, "res")

    monkeypatch.setenv("ASP_MATMUL_PIN", "cfft")
    assert fft_kernel._tab(t, np.float32, "cfft").dtype == jnp.float32
    assert fft_kernel._tab(t, np.float32, "cfft_post").dtype == jnp.float32
    # cfft is composite-scoped: gate/vocoder families fall back to 3-pass
    assert fft_kernel._tab(t, np.float32, "gpre").dtype == jnp.bfloat16
    assert fft_kernel._tab(t, np.float32, "vfft").dtype == jnp.bfloat16

    monkeypatch.setenv("ASP_MATMUL_PIN", "fft")
    assert fft_kernel._tab(t, np.float32, "cfft").dtype == jnp.float32
    assert fft_kernel._tab(t, np.float32, "cfft_post").dtype == jnp.float32
    # the global fft pin covers every grid-table family, post pairs too
    for fam in ("gpre", "gpost", "vfft", "vfft_post"):
        assert fft_kernel._tab(t, np.float32, fam).dtype == jnp.float32

    monkeypatch.setenv("ASP_MATMUL_PIN", "none")
    assert fft_kernel._tab(t, np.float32, "cfft").dtype == jnp.bfloat16
    assert fft_kernel._tab(t, np.float32, "cfft_post").dtype == jnp.bfloat16
    for fam in ("gpre", "gpost", "vfft", "vfft_post"):
        assert fft_kernel._tab(t, np.float32, fam).dtype == jnp.bfloat16


def test_stream_eq_full_under_shipping_precision(rng):
    """Chain.stream stays consistent with Chain.full for the composite
    chain under the SHIPPING precision configuration (bf16x3 emulation
    + default pins): the streaming step kernel runs the pinned pre/
    post table split while the whole-file path runs the whole-file
    composite kernel + the separate envelope stage — their precision
    configurations differ by design, and this pins that the difference
    stays far inside the 60 dB product bound."""
    import os

    prev = os.environ.get("ASP_MATMUL_MODE")
    os.environ["ASP_MATMUL_MODE"] = "bf16x3"
    try:
        from audiosignalprocess_tpu.pipeline import Chain, ResFIRGateStage

        h = oracle.design_fir(64, 0.3)
        env = oracle.design_fir(129, 0.05)
        chain = Chain([ResFIRGateStage(up=160, down=147, h=h, nfft=1024,
                                       hop=256, noise_frames=4, env_h=env)])
        lat = chain.build()
        b_in = 4 * 588
        x = 0.01 * rng.standard_normal((2, b_in * 4)).astype(np.float32)
        x[:, 2000:7000] += np.sin(
            2 * np.pi * 440 * np.arange(5000) / 44100).astype(np.float32)
        ys = np.asarray(chain.stream(x, b_in))
        yf = np.asarray(chain.full(x))
        m = ys.shape[-1] - lat
        snr = oracle.snr_db(yf[:, :m].astype(np.float64) + 1e-30,
                            ys[:, lat:].astype(np.float64) + 1e-30)
        assert snr >= 60.0, snr
    finally:
        if prev is None:
            os.environ.pop("ASP_MATMUL_MODE", None)
        else:
            os.environ["ASP_MATMUL_MODE"] = prev


@pytest.mark.parametrize("pin", ["none", "res", "fft", "res,fft",
                                 "cfft", "cfftpre"])
def test_composite_parity_under_pins(rng, monkeypatch, pin):
    """The whole-file fused composite chain stays ≥60 dB vs the f64
    oracle under every pin setting (the pin changes precision, never
    structure)."""
    monkeypatch.setenv("ASP_MATMUL_MODE", "bf16x3")
    monkeypatch.setenv("ASP_MATMUL_PIN", pin)
    from audiosignalprocess_tpu.kernels.res_chain_kernel import (
        resample_fir_gate_fused,
    )

    h = oracle.design_fir(64, 0.3)
    x = 0.01 * rng.standard_normal((2, 147 * 80)).astype(np.float32)
    x[:, 2000:8000] += np.sin(
        2 * np.pi * 440 * np.arange(6000) / 44100).astype(np.float32)
    out = np.asarray(resample_fir_gate_fused(x, 160, 147, h, noise_frames=4))
    ref = np.stack([
        oracle.noise_gate(oracle.fir_direct(
            oracle.resample_poly(x[i].astype(np.float64), 160, 147,
                                 zero_phase=False), h), noise_frames=4)
        for i in range(2)
    ])
    m = min(out.shape[-1], ref.shape[-1])
    assert oracle.snr_db(ref[:, :m], out[:, :m]) >= 60.0
