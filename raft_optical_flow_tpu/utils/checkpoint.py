"""Orbax full-train-state checkpointing: latest / best / periodic + resume.

Parity targets: the reference's richer trainers save
{epoch/step, model, optimizer, scheduler, best_epe, args} with latest/best/periodic
files and resume support (`train_liteflownet3.py:549-567`, `IFNET_train.py:424-447`,
`train_simple_flow.py:402-445`); `train.py:238-240` saves weights-only every
VAL_FREQ. Here:

  - save_train_state / restore_train_state: the full optimizer-carrying state via
    orbax (async-capable, multi-host safe), one directory per tag
    ('latest', 'best', 'step_00010000').
  - weights-only .npz interop stays in utils/torch_convert.py (portable, and the
    format the torch-conversion tools produce).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(directory: str, tag: str, state, extra: Optional[Dict] = None):
    """Save {step, params, batch_stats, opt_state} (+ extra metadata) under tag."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, tag))
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_train_state(directory: str, tag: str, state):
    """Restore into the structure of `state` (tx preserved); returns new state."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, tag))
    template = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=template)
    return state.replace(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def latest_tag(directory: str) -> Optional[str]:
    """The most recent periodic tag in a checkpoint directory, or None."""
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and name[5:].isdigit():
            steps.append((int(name[5:]), name))
    if os.path.isdir(os.path.join(directory, "latest")):
        return "latest"
    return max(steps)[1] if steps else None


class CheckpointManager:
    """latest/best/periodic policy used by the reference's richer trainers."""

    def __init__(self, directory: str, keep_every: int = 5000):
        self.directory = directory
        self.keep_every = keep_every
        self.best_metric = float("inf")

    def save(self, state, step: int, metric: Optional[float] = None, extra=None):
        save_train_state(self.directory, "latest", state, extra)
        if step % self.keep_every == 0:
            save_train_state(self.directory, f"step_{step:08d}", state, extra)
        if metric is not None and metric < self.best_metric:
            self.best_metric = metric
            save_train_state(self.directory, "best", state, extra)

    def restore_latest(self, state):
        tag = latest_tag(self.directory)
        if tag is None:
            return state, False
        return restore_train_state(self.directory, tag, state), True
