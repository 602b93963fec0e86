"""Checkpoint / resume for the incremental reconstruction.

The reference has no checkpointing (SURVEY.md §5): a killed run restarts
from zero. Here the full `ReconstructionState` pytree (plus registered-view
bookkeeping) serializes to one .npz; `load_state` restores it so the
incremental loop (or any downstream stage) continues where it stopped.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from sfm_danpipeline_tpu.pipeline.tracks import ReconstructionState

_FIELDS = [
    "points_xyz",
    "points_rgb",
    "points_valid",
    "track_feat",
    "feat_to_point",
    "cameras",
    "camera_valid",
    "focal",
    "n_points",
]


def save_state(path: str, state: ReconstructionState, **extra) -> None:
    arrays = {f: np.asarray(getattr(state, f)) for f in _FIELDS}
    for k, v in extra.items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> Tuple[ReconstructionState, dict]:
    z = np.load(path)
    state = ReconstructionState(
        **{f: jnp.asarray(z[f]) for f in _FIELDS}
    )
    extra = {
        k[len("extra_"):]: z[k] for k in z.files if k.startswith("extra_")
    }
    return state, extra
