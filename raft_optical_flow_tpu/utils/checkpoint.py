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

import json
import os
from typing import Dict, Optional

import jax
import numpy as np

#: Validator keys that are end-point-errors (lower is better). Validators also
#: return 1px/3px/5px accuracies and KITTI F1 (higher is better), so "best"
#: selection must never take a bare min over all values.
EPE_KEYS = ("chairs", "clean", "final", "kitti-epe", "epe", "loss")


def best_checkpoint_metric(results: Dict[str, float]) -> Optional[float]:
    """Pick the lower-is-better scalar to track 'best' checkpoints with.

    Takes the min over the EPE-style entries of a validator result dict
    (`evaluate.py:193-203` records EPE as the headline number); accuracy
    fractions (`*_1px` etc.) and F1 are ignored. Returns None when the dict
    has no lower-is-better entry, in which case no 'best' save happens.
    """
    vals = [
        float(v)
        for k, v in results.items()
        if k in EPE_KEYS or k.endswith("epe")
    ]
    return min(vals) if vals else None


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_train_state(directory: str, tag: str, state, extra: Optional[Dict] = None):
    """Save {step, params, batch_stats, opt_state} (+ extra metadata) under tag.

    COLLECTIVE under multi-host SPMD: orbax synchronizes processes internally
    (process_allgather + barriers), so every process must call this at the
    same point; orbax then writes replicated/numpy data from the primary host
    only. The fetches below are collective-free local-shard copies so the
    payload orbax sees is plain numpy.
    """
    from raft_optical_flow_tpu.parallel.distributed import fetch_replicated

    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, tag))
    payload = {
        "step": np.asarray(fetch_replicated(state.step)),
        "params": fetch_replicated(state.params),
        "batch_stats": fetch_replicated(state.batch_stats),
        "opt_state": fetch_replicated(state.opt_state),
    }
    if extra:
        payload["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    return path


def restore_train_state(directory: str, tag: str, state):
    """Restore into the structure of `state` (tx preserved); returns new state."""
    from raft_optical_flow_tpu.parallel.distributed import fetch_replicated

    ocp = _ocp()
    path = os.path.abspath(os.path.join(directory, tag))
    template = {
        "step": np.asarray(fetch_replicated(state.step)),
        "params": fetch_replicated(state.params),
        "batch_stats": fetch_replicated(state.batch_stats),
        "opt_state": fetch_replicated(state.opt_state),
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
    """latest/best/periodic policy used by the reference's richer trainers.

    best_metric is persisted to `<dir>/best.json` so that a resumed run does
    not overwrite the historical best checkpoint with a worse model on its
    first validation (the reference carries best_epe inside its checkpoint
    dicts, `train_liteflownet3.py:549-567`).
    """

    def __init__(self, directory: str, keep_every: int = 5000):
        self.directory = directory
        self.keep_every = keep_every
        self.best_metric = self._load_best_metric()
        # best.json is written by the lead host only; on a multi-host restart
        # without a shared filesystem the other processes would load inf and
        # enter the collective `save_train_state("best", ...)` asymmetrically,
        # deadlocking the pod. Broadcast the lead's value so the
        # metric < best_metric branch is taken identically everywhere.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            self.best_metric = float(
                multihost_utils.broadcast_one_to_all(
                    np.float32(self.best_metric)
                )
            )

    def _best_path(self) -> str:
        return os.path.join(self.directory, "best.json")

    def _load_best_metric(self) -> float:
        try:
            with open(self._best_path()) as f:
                return float(json.load(f)["best_metric"])
        except (OSError, ValueError, KeyError):
            return float("inf")

    def save(self, state, step: int, metric: Optional[float] = None, extra=None):
        """COLLECTIVE under multi-host SPMD (see save_train_state): every
        process calls it with identical (replicated) state/metric; only the
        lead writes the plain-file metadata."""
        from raft_optical_flow_tpu.parallel.distributed import is_lead_host

        save_train_state(self.directory, "latest", state, extra)
        if step % self.keep_every == 0:
            save_train_state(self.directory, f"step_{step:08d}", state, extra)
        if metric is not None and metric < self.best_metric:
            self.best_metric = metric
            save_train_state(self.directory, "best", state, extra)
            if is_lead_host():
                with open(self._best_path(), "w") as f:
                    json.dump({"best_metric": metric, "step": step}, f)

    def restore_latest(self, state):
        tag = latest_tag(self.directory)
        if tag is None:
            return state, False
        return restore_train_state(self.directory, tag, state), True
