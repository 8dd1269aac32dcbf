#!/usr/bin/env python
"""Config 5 (BASELINE.json:11): streaming 128-channel chain — polyphase
resample (160/147) + FIR bank + STFT noise gate + envelope demod — block
streaming with exact carry state, or time-block sharded whole-file
(SURVEY.md §3.4)."""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from audiosignalprocess_tpu.cpu_ref import oracle
from audiosignalprocess_tpu.parallel.launch import initialize
from audiosignalprocess_tpu.parallel.mesh import make_mesh, shard_audio
from audiosignalprocess_tpu.parallel.sharded import sharded_chain
from audiosignalprocess_tpu.pipeline import (
    Chain, EnvelopeStage, FIRStage, GateStage, ResampleStage,
)
from tools.common import load_or_make, maybe_write, report, snr_db, std_parser, timed, to_host

RATE_IN, RATE_OUT = 44100, 48000
CHANNELS = 128
BLOCK = 147 * 64  # input block: divisible by down=147; output block 10240


def build_chain() -> Chain:
    return Chain([
        ResampleStage(up=160, down=147),
        FIRStage(h=oracle.design_fir(64, 0.3), nfft=1024),
        GateStage(nfft=1024, hop=256, noise_frames=8),
        EnvelopeStage(oracle.design_fir(129, 0.01)),
    ])


def main():
    p = std_parser(__doc__)
    p.add_argument("--mode", choices=("stream", "sharded"), default="stream")
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args()
    initialize(args.coordinator, args.num_processes, args.process_id)

    x = load_or_make(args, channels=CHANNELS, rate=RATE_IN)
    chain = build_chain()
    lat = chain.build()

    if args.mode == "stream":
        n = (x.shape[-1] // BLOCK) * BLOCK
        x = x[:, :n]
        x_host = np.asarray(x)
        fn = jax.jit(lambda v: chain.stream(v, BLOCK))
    else:
        ndev = len(jax.devices())
        tm = ndev
        per = 147 * 32
        n = (x.shape[-1] // (tm * per)) * (tm * per)
        x = x[:, :n]
        x_host = np.asarray(x)
        mesh = make_mesh(channel=1, time=tm)
        fn = sharded_chain(mesh, chain)
        x = shard_audio(x, mesh)

    out, dt = timed(fn, x) if args.bench else (fn(x), None)
    out = to_host(out)

    snr = None
    if args.check:
        full = np.asarray(jax.jit(chain.full)(jax.numpy.asarray(x_host[:2])))
        if args.mode == "stream":
            got = out[:2, lat:]
            snr = snr_db(full[:, : got.shape[-1]], got)
        else:
            snr = snr_db(full, out[:2])
        assert snr >= 60.0, f"parity FAILED: {snr:.1f} dB"

    maybe_write(args, out, RATE_OUT)
    report(f"config5_streaming_{CHANNELS}ch_{args.mode}", x_host, out, dt, snr, args)


if __name__ == "__main__":
    main()
