"""utils subsystem tests: metrics, debug, profiling (SURVEY.md §5)."""

import io

import numpy as np
import pytest

from audiosignalprocess_tpu.utils import debug, metrics
from audiosignalprocess_tpu.utils.profiling import BlockLogger, annotate, named_scope


class TestMetrics:
    def test_snr_db(self):
        x = np.ones(100)
        assert metrics.snr_db(x, x) == np.inf
        noisy = x + 1e-3
        assert 55 < metrics.snr_db(x, noisy) < 65

    def test_roofline_model(self):
        chip = metrics.TPU_V5E
        b = metrics.fft_roofline_bytes(64, 1024, 4, complex_io=True)
        assert b == 2 * 64 * 1024 * 8
        assert metrics.roofline_time_s(b, chip) == b / (chip.hbm_gbps * 1e9)

    def test_detect_chip(self):
        assert metrics.detect_chip().hbm_gbps > 0


class TestDebug:
    def test_assert_snr(self):
        x = np.random.default_rng(0).standard_normal(256)
        assert debug.assert_snr(x, x + 1e-9) > 60
        with pytest.raises(AssertionError):
            debug.assert_snr(x, x + 0.5, min_db=60)

    def test_interpret_kernels_scope(self):
        import os

        with debug.interpret_kernels():
            assert os.environ["ASP_INTERPRET_PALLAS"] == "1"

    def test_nan_checks_scope(self):
        import jax

        with debug.nan_checks():
            assert jax.config.jax_debug_nans
        assert not jax.config.jax_debug_nans


class TestProfiling:
    def test_block_logger(self):
        buf = io.StringIO()
        bl = BlockLogger(stream=buf, every=1)
        for _ in range(3):
            bl.tick(1024, stage="fir")
        lines = [l for l in buf.getvalue().splitlines() if l]
        assert len(lines) == 2  # first tick only sets the clock
        import json

        rec = json.loads(lines[0])
        assert rec["samples"] == 1024 and rec["stage"] == "fir"

    def test_named_scope_and_annotate(self):
        import jax.numpy as jnp

        with named_scope("test"), annotate("test"):
            assert float(jnp.sum(jnp.ones(4))) == 4.0


def test_conformance_doc_fresh():
    """docs/CONFORMANCE.md is regenerated from the oracle docstrings;
    a stale doc means a convention changed without the doc."""
    import subprocess, sys, pathlib

    repo = pathlib.Path(__file__).resolve().parents[2]
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_conformance.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_api_doc_fresh():
    """docs/API.md is regenerated from the public docstrings; a stale
    doc means the API changed without the reference page."""
    import os, subprocess, sys, pathlib

    repo = pathlib.Path(__file__).resolve().parents[2]
    env = dict(os.environ, ASP_FORCE_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_api.py"), "--check"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
