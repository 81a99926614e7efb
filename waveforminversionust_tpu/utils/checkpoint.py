"""Checkpoint / resume for long inversions (orbax-backed).

The reference has no persistence at all — results live only in process
memory (SURVEY.md section 5). Here the full inversion state (slowness,
search direction, previous gradient, stage/iteration counters and the
frequency schedule position) round-trips through orbax so a continuation
sweep can resume exactly where it stopped.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _to_host(tree):
    from .host import fetch_tree
    return fetch_tree(tree)


def save_state(path: str, state: dict) -> None:
    """Save an inversion-state dict of arrays/scalars to ``path``."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, _to_host(state), force=True)
    ckpt.wait_until_finished()


def load_state(path: str) -> dict:
    """Restore an inversion-state dict saved by :func:`save_state`."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path)


def make_stage_checkpointer(directory: str):
    """Callback for :func:`..fwi.runner.invert_dataset`: saves velocity and
    stage metadata after every continuation stage."""
    os.makedirs(directory, exist_ok=True)

    def callback(stage_idx, freq, velocity, stage_metrics):
        # freq is a scalar for continuation stages and a tuple for the
        # joint-multifrequency method's single stage
        save_state(os.path.join(directory, f"stage_{stage_idx:03d}"), {
            "velocity": np.asarray(jax.device_get(velocity)),
            "frequency": np.asarray(freq, np.float64),
            "stage": np.int32(stage_idx),
        })

    return callback
