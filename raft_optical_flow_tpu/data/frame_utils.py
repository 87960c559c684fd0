"""Flow / image file codecs: Middlebury .flo, .pfm, KITTI 16-bit png.

Parity targets: `core/utils/frame_utils.py:12-137`. Implemented with numpy + PIL only
(no cv2 dependency for the png path — PIL reads/writes 16-bit pngs; KITTI encoding is
(v * 64 + 2^15) in uint16 with a validity third channel).
"""

from __future__ import annotations

import os
import re
from typing import Tuple

import numpy as np
from PIL import Image

FLO_MAGIC = 202021.25


def read_flow(path: str) -> np.ndarray:
    """Read a Middlebury .flo file -> [H, W, 2] float32.

    Uses the native C++ decoder (data/native.py) when available; pure-numpy
    fallback otherwise.
    """
    from raft_optical_flow_tpu.data import native

    out = native.read_flow_native(path) if native.native_available() else None
    if out is not None:
        return out
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(FLO_MAGIC):
            raise ValueError(f"{path}: invalid .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flow(path: str, flow: np.ndarray) -> None:
    """Write [H, W, 2] float32 flow as Middlebury .flo."""
    flow = np.asarray(flow, dtype=np.float32)
    assert flow.ndim == 3 and flow.shape[2] == 2
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        np.array([FLO_MAGIC], np.float32).tofile(f)
        np.array([w], np.int32).tofile(f)
        np.array([h], np.int32).tofile(f)
        flow.astype(np.float32).tofile(f)


def read_pfm(path: str) -> np.ndarray:
    """Read a .pfm file -> [H, W] or [H, W, 3] float array (top-down).

    Uses the native C++ decoder when available.
    """
    from raft_optical_flow_tpu.data import native

    out = native.read_pfm_native(path) if native.native_available() else None
    if out is not None:
        return out
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = re.match(rb"^(\d+)\s(\d+)\s*$", f.readline())
        if not dims:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, dims.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)).copy()


def read_flow_kitti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read a KITTI 16-bit flow png -> (flow [H,W,2] float32, valid [H,W] float32)."""
    import cv2  # PIL cannot read 3-channel 16-bit pngs

    img = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    img = img[:, :, ::-1].astype(np.float32)  # BGR -> RGB
    flow = img[:, :, :2]
    valid = img[:, :, 2]
    flow = (flow - 2**15) / 64.0
    return flow, valid


def write_flow_kitti(path: str, flow: np.ndarray) -> None:
    """Write [H,W,2] flow as a KITTI 16-bit png (all pixels valid)."""
    import cv2  # PIL cannot write 3-channel 16-bit pngs

    uv = 64.0 * np.asarray(flow) + 2**15
    valid = np.ones((uv.shape[0], uv.shape[1], 1))
    out = np.concatenate([uv, valid], axis=-1).astype(np.uint16)
    cv2.imwrite(path, out[..., ::-1])


def read_disp_kitti(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI disparity png -> (flow [H,W,2] with u=-disp, valid mask)."""
    disp = np.array(Image.open(path)).astype(np.float32) / 256.0
    valid = disp > 0.0
    flow = np.stack([-disp, np.zeros_like(disp)], axis=-1)
    return flow, valid


def read_gen(file_name: str):
    """Extension-dispatched reader (`core/utils/frame_utils.py:123-137`)."""
    ext = os.path.splitext(file_name)[-1].lower()
    if ext == ".ppm":
        from raft_optical_flow_tpu.data import native

        out = native.read_ppm_native(file_name) if native.native_available() else None
        return out if out is not None else Image.open(file_name)
    if ext in (".png", ".jpeg", ".jpg"):
        return Image.open(file_name)
    if ext in (".bin", ".raw"):
        return np.load(file_name)
    if ext == ".flo":
        return read_flow(file_name).astype(np.float32)
    if ext == ".pfm":
        flow = read_pfm(file_name).astype(np.float32)
        return flow if flow.ndim == 2 else flow[:, :, :-1]
    return []
