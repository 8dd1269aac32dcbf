"""Shared helpers for the config drivers (SURVEY.md §2 row 15: the
reference's per-effect demo mains, rebuilt as per-config runners for the
five driver configs of BASELINE.json:7-11)."""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.utils.validate import check
from audiosignalprocess_tpu.io.wav import read_wav, write_wav

# Honor ASP_FORCE_PLATFORM in every driver (the TPU plugin force-registers
# itself and ignores the JAX_PLATFORMS env var; only jax.config works).
# Must run before the first jax computation initializes the backend.
_plat = os.environ.get("ASP_FORCE_PLATFORM")
if _plat:
    import jax

    jax.config.update("jax_platforms", _plat)


def make_test_wav(path: str, channels: int, rate: int, seconds: float,
                  kind: str = "tone+noise", seed: int = 0) -> None:
    """Generate a deterministic multichannel test WAV."""
    rng = np.random.default_rng(seed)
    n = int(rate * seconds)
    t = np.arange(n) / rate
    x = np.zeros((channels, n))
    for c in range(channels):
        f = 220.0 * (2.0 ** (c % 12 / 12.0))
        if kind == "tone+noise":
            x[c] = 0.01 * rng.standard_normal(n)
            gate = (t > 0.25 * seconds / 1.0) & (t < 0.7 * seconds)
            x[c] += np.where(gate, 0.5 * np.sin(2 * np.pi * f * t), 0.0)
        elif kind == "am":
            x[c] = (1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * t)) * np.sin(2 * np.pi * f * t) * 0.4
        else:
            x[c] = 0.5 * np.sin(2 * np.pi * f * t)
    write_wav(path, x, rate, float_fmt=True)


def std_parser(desc: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=desc)
    p.add_argument("--input", default=None, help="input WAV (generated if omitted)")
    p.add_argument("--output", default=None, help="output WAV path")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--check", action="store_true", help="verify vs CPU oracle")
    p.add_argument("--bench", action="store_true", help="timed re-runs")
    p.add_argument("--json", action="store_true", help="print metrics as JSON")
    # second data regime for the per-round records (VERDICT r4 item 6:
    # gate-decision SNR is input-dependent; one seed can hide 26 dB)
    p.add_argument("--seed", type=int, default=0,
                   help="generated-input RNG seed (ignored with --input)")
    # the fused Pallas kernels are the product path (BASELINE.json:5);
    # --no-fused falls back to the plain XLA formulations
    p.add_argument("--no-fused", action="store_true",
                   help="use plain XLA paths instead of fused Pallas kernels")
    return p


def load_or_make(args, channels: int, rate: int, kind: str = "tone+noise"):
    if args.input:
        x, r = read_wav(args.input, dtype=np.float32)
        check(r == rate, f"expected {rate} Hz input, got {r}")
        return x
    import tempfile, os

    seed = getattr(args, "seed", 0)
    path = os.path.join(tempfile.gettempdir(),
                        f"asp_gen_{channels}ch_{rate}_s{seed}.wav")
    make_test_wav(path, channels, rate, args.seconds, kind, seed=seed)
    x, _ = read_wav(path, dtype=np.float32)
    return x


def report(name: str, x, out, dt: float | None, snr: float | None, args) -> None:
    rec = {
        "config": name,
        "in_shape": list(np.shape(x)),
        "out_shape": list(np.shape(out)),
    }
    if dt is not None:
        rec["seconds_per_run"] = round(dt, 6)
        rec["samples_per_s"] = round(float(np.prod(np.shape(x))) / dt, 1)
    if snr is not None:
        rec["snr_db_vs_oracle"] = round(snr, 2)
        rec["parity"] = bool(snr >= 60.0)
    if args.json:
        print(json.dumps(rec))
    else:
        for k, v in rec.items():
            print(f"  {k}: {v}")


def timed(fn, x, iters: int = 5):
    """Time fn(x): scalar-checksum host fetches force full execution on
    remote/relayed backends (block_until_ready alone may not await).

    INTENTIONALLY end-to-end per dispatch (host->device->host including
    transport): the per-config matrix rows in BASELINE.md record the
    product path a user experiences; device-loop kernel throughput is
    bench.py's on-device lax.fori_loop job (CLAUDE.md timing rule), and
    the matrix's amortized column (--seconds 60) separates the two."""
    import jax
    import jax.numpy as jnp

    out = fn(x)
    float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(out)[0][..., :64])))
    t0 = time.perf_counter()
    for k in range(iters):
        o = fn(x * (1.0 + 1e-6 * (k + 1)))  # distinct args defeat RPC caching
        float(jnp.sum(jnp.abs(jax.tree_util.tree_leaves(o)[0][..., :64])))
    dt = (time.perf_counter() - t0) / iters
    return out, dt


def to_host(out) -> np.ndarray:
    """Fetch a (possibly globally-sharded) array to the host: multi-process
    arrays span non-addressable devices, so allgather across processes."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(out, tiled=True))
    return np.asarray(out)


def maybe_write(args, out, rate: int) -> None:
    if args.output:
        write_wav(args.output, np.asarray(out), rate, float_fmt=True)


snr_db = oracle.snr_db
