"""Checkpoint / resume for streaming state.

The reference has no persistence; its only state is device-resident ring
buffers + pointers (SURVEY §5.4). Here every engine's state is an explicit
pytree, so checkpointing is trivially exact: serialize the leaves, restore,
and the stream continues bit-identically (asserted in tests).

Format: a single .npz per checkpoint — adequate for kilobyte..megabyte DSP
state (orbax would be overkill; swap in if states ever shard across hosts).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state: Any, meta: dict | None = None) -> None:
    """Serialize a state pytree to `path` (.npz) with its tree structure."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    payload = {
        "treedef": str(treedef),
        "n_leaves": len(leaves),
        "meta": meta or {},
    }
    np.savez(path, __payload__=json.dumps(payload), **arrays)


def load_state(path: str, like: Any) -> Any:
    """Restore a state pytree saved by save_state.

    `like` provides the tree structure (e.g. a freshly-initialized state of
    the same config); leaf count is validated against the file.
    """
    with np.load(path, allow_pickle=False) as data:
        payload = json.loads(str(data["__payload__"]))
        n = payload["n_leaves"]
        leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    like_leaves, treedef = jax.tree.flatten(like)
    if len(like_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves but template has {len(like_leaves)}")
    return jax.tree.unflatten(treedef, leaves)


def load_meta(path: str) -> dict:
    with np.load(path, allow_pickle=False) as data:
        return json.loads(str(data["__payload__"]))["meta"]
