"""Checkpoint/resume for the temporal render loop.

The reference has no persistence — its inter-frame state lives in 5 GL
textures (main.cpp:317-333). Here FrameState is a pytree, so serialization is
a flat npz (no deps) with orbax available for multi-host runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuray.render.frame_state import FrameState

_FIELDS = [
    "illum_hist", "variance_hist", "prev_normal", "prev_linear_z",
    "moments", "history_len", "accum_color", "taa_color",
    "frame_idx", "prev_view_proj",
]


def save_frame_state(path: str, state: FrameState) -> None:
    np.savez(path, **{f: np.asarray(getattr(state, f)) for f in _FIELDS})


def load_frame_state(path: str) -> FrameState:
    z = np.load(path)
    return FrameState(**{f: jnp.asarray(z[f]) for f in _FIELDS})


def save_pytree(path: str, tree) -> None:
    """Generic flat-pytree npz save (used for optimizer/train state)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path, n=len(leaves),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_pytree(path: str, like):
    z = np.load(path)
    leaves = [jnp.asarray(z[f"leaf_{i}"]) for i in range(int(z["n"]))]
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, leaves)
