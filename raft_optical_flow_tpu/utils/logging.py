"""Observability: TensorBoard scalars/images + tee-to-file console logger.

Parity targets:
  - TensorBoard SummaryWriter usage throughout the reference drivers
    (`train.py:139-164`, `train_liteflownet3.py:274-278,373-382`): scalar means
    every SUM_FREQ steps, flow-visualization images on validation.
  - Tee logger duplicating stdout to a run log file (`train_liteflownet3.py:32-77`).
"""

from __future__ import annotations

import os
import sys
from datetime import datetime
from typing import Dict

import numpy as np


class TensorBoardWriter:
    """Thin wrapper over tensorboardX.SummaryWriter with flow-image helpers."""

    def __init__(self, log_dir: str = "runs"):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(log_dir)

    def add_scalar(self, tag: str, value: float, step: int):
        self.writer.add_scalar(tag, value, step)

    def add_scalars(self, values: Dict[str, float], step: int, prefix: str = ""):
        for k, v in values.items():
            self.writer.add_scalar(prefix + k, float(v), step)

    def add_flow_image(self, tag: str, flow: np.ndarray, step: int):
        """flow: [H, W, 2] -> Middlebury color viz."""
        from raft_optical_flow_tpu.utils.flow_viz import flow_to_image

        img = flow_to_image(np.asarray(flow))
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def add_image(self, tag: str, image: np.ndarray, step: int):
        self.writer.add_image(tag, np.asarray(image), step, dataformats="HWC")

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


def save_flow_grid(path: str, panels, ncols: int = 3, titles=None):
    """Save a grid of flow visualizations + images as one PNG.

    The matplotlib multi-scale debug grids of the reference trainers
    (`train_liteflownet3.py:219-247`, `IFNET_train.py:258-284`). `panels` is a
    list of [H, W, 2] flows (visualized via the Middlebury wheel) or [H, W, 3]
    images (shown as-is, assumed 0-1 or 0-255).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from raft_optical_flow_tpu.utils.flow_viz import flow_to_image

    n = len(panels)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 4 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.axis("off")
        if i >= n:
            continue
        p = np.asarray(panels[i])
        if p.shape[-1] == 2:
            ax.imshow(flow_to_image(p))
        else:
            img = p if p.max() > 1.5 else p * 255.0
            ax.imshow(img.astype(np.uint8))
        if titles and i < len(titles):
            ax.set_title(titles[i])
    fig.tight_layout()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path


class TeeLogger:
    """Duplicate stdout to a timestamped log file (`train_liteflownet3.py:32-77`)."""

    def __init__(self, log_dir: str = "logs", name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
        self.path = os.path.join(log_dir, f"{name}_{stamp}.log")
        self._file = open(self.path, "a")
        self._stdout = sys.stdout

    def write(self, msg: str):
        self._stdout.write(msg)
        self._file.write(msg)
        self._file.flush()

    def flush(self):
        self._stdout.flush()
        self._file.flush()

    def __enter__(self):
        sys.stdout = self
        return self

    def __exit__(self, *exc):
        sys.stdout = self._stdout
        self._file.close()
        return False
