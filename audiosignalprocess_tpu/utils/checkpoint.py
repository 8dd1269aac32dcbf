"""Checkpoint/resume for the streaming carry (SURVEY.md §5).

The streaming state (filter tails, OLA tails, resampler history, spectral
FIFOs) is a small pytree; save/restore as a flat .npz keyed by tree path
plus the block index.  Restarting a stream from block k with the restored
carry reproduces the uninterrupted stream exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(carry):
    leaves, treedef = jax.tree_util.tree_flatten(carry)
    return leaves, treedef


def _npz(path: str) -> str:
    # np.savez appends ".npz" to extension-less paths but np.load opens
    # the path verbatim; normalize so save_carry("carry.state") and
    # load_carry("carry.state") always refer to the same file
    return path if path.endswith(".npz") else path + ".npz"


def save_carry(path: str, carry, block_index: int) -> None:
    leaves, _ = _flatten(carry)
    arrs = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrs["block_index"] = np.asarray(block_index, dtype=np.int64)
    np.savez(_npz(path), **arrs)


def load_carry(path: str, carry_template) -> tuple:
    """Returns (carry, block_index); carry matches the template's treedef."""
    data = np.load(_npz(path))
    leaves, treedef = _flatten(carry_template)
    restored = [
        jnp.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype)
        for i in range(len(leaves))
    ]
    carry = jax.tree_util.tree_unflatten(treedef, restored)
    return carry, int(data["block_index"])
