"""Halo exchange over the time axis (SURVEY.md §2 P3).

Overlap-save needs the previous shard's last taps-1 samples; STFT needs
the next shard's first nfft-hop samples.  Both are single-hop neighbor
shifts — ``lax.ppermute`` inside ``shard_map``, the direct ICI analog of
ring/halo exchange (BASELINE.json:5,10).  Edge shards get zeros (cold
start / stream end), matching the oracle's causal conventions.

These functions must be called inside ``shard_map`` with ``axis_name``
bound.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from audiosignalprocess_tpu.utils.validate import check


def halo_left(x: jnp.ndarray, halo: int, axis_name: str = "time") -> jnp.ndarray:
    """Prepend the left neighbor's last ``halo`` samples: (..., L) -> (..., halo+L).

    Shard 0 receives zeros (causal cold start).  ``halo`` must fit in one
    shard: the exchange is single-hop, and a silent jnp slice clamp would
    otherwise fabricate history.
    """
    check(0 <= halo <= x.shape[-1], f"halo {halo} exceeds local shard length {x.shape[-1]} "
        f"(single-hop halo exchange)")
    if halo == 0:
        # x[..., -0:] would slice the WHOLE shard (and ppermute all of it)
        return x
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.concatenate(
            [jnp.zeros(x.shape[:-1] + (halo,), x.dtype), x], axis=-1
        )
    idx = lax.axis_index(axis_name)
    tail = x[..., -halo:]
    recv = lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return jnp.concatenate([recv, x], axis=-1)


def halo_right(x: jnp.ndarray, halo: int, axis_name: str = "time") -> jnp.ndarray:
    """Append the right neighbor's first ``halo`` samples: (..., L) -> (..., L+halo).

    The last shard receives zeros (stream end).  See halo_left for the
    single-hop halo <= shard-length requirement.
    """
    check(0 <= halo <= x.shape[-1], f"halo {halo} exceeds local shard length {x.shape[-1]} "
        f"(single-hop halo exchange)")
    if halo == 0:
        return x  # symmetry with halo_left (and skip the empty ppermute)
    n = lax.axis_size(axis_name)
    if n == 1:
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (halo,), x.dtype)], axis=-1
        )
    idx = lax.axis_index(axis_name)
    head = x[..., :halo]
    recv = lax.ppermute(head, axis_name, [(i, (i - 1) % n) for i in range(n)])
    recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
    return jnp.concatenate([x, recv], axis=-1)


def send_right_add(tail: jnp.ndarray, head: jnp.ndarray,
                   axis_name: str = "time") -> jnp.ndarray:
    """Overlap-add boundary fix-up: add my left neighbor's ``tail`` into my
    ``head`` (same length).  Used by sharded ISTFT where each shard's OLA
    spills nfft-hop samples into the next shard (SURVEY.md §2 P4)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return head
    idx = lax.axis_index(axis_name)
    recv = lax.ppermute(tail, axis_name, [(i, (i + 1) % n) for i in range(n)])
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return head + recv
