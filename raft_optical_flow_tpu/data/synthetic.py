"""Synthetic training pairs with exact ground-truth flow from real images.

No optical-flow dataset ships in this environment, so convergence runs build
pairs from the real demo frames: sample a crop of a real image, generate a
smooth random flow field g, and synthesize the second view by bilinear
resampling — image1(y) = crop(y + g(y)) — so the flow from image1 to the
original crop is exactly g (up to resampling blur) and EPE against it is
measurable. Photometric structure is real, which is what the unsupervised
losses (census / SSIM / photometric) need to produce gradients; pure-noise
images (the reference's DummyDataset, `train_simple_flow.py:180-228`) cannot
drive them.

The reference has no equivalent (its unsupervised scripts assume Sintel on
disk); this is infrastructure for dataset-free training verification.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np

DEFAULT_FRAMES = "/root/reference/demo-frames"


def _load_frames(frames_dir: str):
    from PIL import Image

    names = sorted(f for f in os.listdir(frames_dir) if f.endswith((".png", ".jpg")))
    return [
        np.array(Image.open(os.path.join(frames_dir, n))).astype(np.float32)
        for n in names
    ]


def _smooth_flow(rng, H: int, W: int, max_mag: float) -> np.ndarray:
    """Smooth random field: coarse noise bilinearly upsampled to [H, W, 2]."""
    coarse = rng.uniform(-max_mag, max_mag, (4, 5, 2)).astype(np.float32)
    ys = np.linspace(0, coarse.shape[0] - 1, H)
    xs = np.linspace(0, coarse.shape[1] - 1, W)
    y0 = np.clip(ys.astype(int), 0, coarse.shape[0] - 2)
    x0 = np.clip(xs.astype(int), 0, coarse.shape[1] - 2)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    c00 = coarse[y0][:, x0]
    c01 = coarse[y0][:, x0 + 1]
    c10 = coarse[y0 + 1][:, x0]
    c11 = coarse[y0 + 1][:, x0 + 1]
    return ((1 - wy) * ((1 - wx) * c00 + wx * c01)
            + wy * ((1 - wx) * c10 + wx * c11)).astype(np.float32)


def _bilinear_gather(img: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Sample img [H, W, C] at coords [h, w, 2] (x, y), border-clamped."""
    H, W = img.shape[:2]
    x = np.clip(coords[..., 0], 0, W - 1)
    y = np.clip(coords[..., 1], 0, H - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, W - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, H - 2)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    return ((1 - fy) * ((1 - fx) * img[y0, x0] + fx * img[y0, x0 + 1])
            + fy * ((1 - fx) * img[y0 + 1, x0] + fx * img[y0 + 1, x0 + 1]))


class SyntheticFlowDataset:
    """FlowDataset-compatible warped-pair dataset (deterministic per index).

    Drop-in for `fetch_dataset` results wherever no flow dataset exists on disk
    (the reference's DummyDataset role, `train_simple_flow.py:180-228`, but with
    real photometric structure and exact ground-truth flow). Samples are a pure
    function of (index, rng): the same index always yields the same pair when
    the loader supplies its deterministic per-sample rng, so multi-host runs
    sharding this dataset reproduce single-host runs exactly.
    """

    def __init__(
        self,
        crop: Tuple[int, int] = (64, 96),
        length: int = 1024,
        max_flow: float = 6.0,
        frames_dir: Optional[str] = None,
    ):
        self.frames = _load_frames(frames_dir or DEFAULT_FRAMES)
        self.crop = crop
        self.length = length
        self.max_flow = max_flow

    def __len__(self):
        return self.length

    def __getitem__(self, index: int, rng=None):
        if rng is None:
            rng = np.random.default_rng(index)
        # legacy RandomState API used by the pair generator below
        r = np.random.RandomState(int(rng.integers(2**31)))
        ch, cw = self.crop
        margin = int(np.ceil(self.max_flow)) + 2
        img = self.frames[r.randint(len(self.frames))]
        H, W = img.shape[:2]
        y0 = r.randint(margin, H - ch - margin)
        x0 = r.randint(margin, W - cw - margin)
        gy, gx = np.mgrid[0:ch, 0:cw].astype(np.float32)
        g = _smooth_flow(r, ch, cw, self.max_flow)
        coords = np.stack([gx + x0 + g[..., 0], gy + y0 + g[..., 1]], axis=-1)
        image1 = _bilinear_gather(img, coords).astype(np.float32)
        image2 = img[y0 : y0 + ch, x0 : x0 + cw].astype(np.float32)
        return image1, image2, g, np.ones((ch, cw), np.float32)


def warped_pair_batches(
    batch_size: int,
    crop: Tuple[int, int] = (64, 96),
    max_flow: float = 6.0,
    seed: int = 0,
    frames_dir: Optional[str] = None,
) -> Iterator[dict]:
    """Endless {image1, image2, flow, valid} batches (0-255 images, exact flow)."""
    frames = _load_frames(frames_dir or DEFAULT_FRAMES)
    rng = np.random.RandomState(seed)
    ch, cw = crop
    margin = int(np.ceil(max_flow)) + 2

    while True:
        b = {"image1": [], "image2": [], "flow": [], "valid": []}
        for _ in range(batch_size):
            img = frames[rng.randint(len(frames))]
            H, W = img.shape[:2]
            y0 = rng.randint(margin, H - ch - margin)
            x0 = rng.randint(margin, W - cw - margin)
            # sample image1 from a slightly larger context so warped taps stay real
            gy, gx = np.mgrid[0:ch, 0:cw].astype(np.float32)
            g = _smooth_flow(rng, ch, cw, max_flow)
            coords = np.stack([gx + x0 + g[..., 0], gy + y0 + g[..., 1]], axis=-1)
            image1 = _bilinear_gather(img, coords)
            image2 = img[y0 : y0 + ch, x0 : x0 + cw]
            b["image1"].append(image1)
            b["image2"].append(image2)
            b["flow"].append(g)
            b["valid"].append(np.ones((ch, cw), np.float32))
        yield {k: np.stack(v).astype(np.float32) for k, v in b.items()}
