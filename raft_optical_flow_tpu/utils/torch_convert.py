"""PyTorch -> Flax checkpoint conversion for the reference model zoo.

Maps the reference's torch `state_dict` names onto this repo's Flax parameter trees:
  - `module.` / `model.` prefixes stripped (DataParallel / Lightning wrappers,
    `train.py:172`, `train_liteflownet3.py:499-523`).
  - Sequential indices flattened: `layer1.0.` -> `layer1_0/`, `mask.0` -> `mask_0`.
  - Conv weights OIHW -> HWIO; ConvTranspose weights (I, O, kh, kw) -> (kh, kw, O, I)
    (we configure flax ConvTranspose with transpose_kernel=True).
  - BatchNorm: weight/bias -> params scale/bias; running_mean/var -> batch_stats
    mean/var; num_batches_tracked dropped.

Only torch is required at conversion time; converted checkpoints are plain
numpy/orbax trees. Requires `torch` (CPU) which is available in the image.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _flatten_name(name: str) -> str:
    """Flatten torch module paths to flax-safe names: 'layer1.0' -> 'layer1_0'."""
    # join numeric sequential indices into their parent name
    parts = name.split(".")
    out = []
    for p in parts:
        if re.fullmatch(r"\d+", p) and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return "/".join(out)


def torch_state_dict_to_flax(
    state_dict: Dict[str, "np.ndarray"],
    rename=None,
    deconv_names=(),
) -> Dict[str, Any]:
    """Convert a torch state_dict (tensors or ndarrays) to flax variables.

    Args:
      state_dict: mapping of torch parameter names to tensors.
      rename: optional callable(str) -> str applied to the flattened path to
        adapt model-specific naming differences.
      deconv_names: iterable of path substrings identifying ConvTranspose weights
        (torch layout (in, out, kh, kw)).

    Returns {'params': ..., 'batch_stats': ...} nested dicts of numpy arrays.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    items = {}
    for k, v in state_dict.items():
        for prefix in ("module.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
        items[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    # classify batchnorm modules: any module owning a running_mean
    bn_modules = {k.rsplit(".", 1)[0] for k in items if k.endswith("running_mean")}

    for k, v in items.items():
        if k.endswith("num_batches_tracked"):
            continue
        mod, leaf = k.rsplit(".", 1)
        flat_mod = _flatten_name(mod)
        if rename is not None:
            flat_mod = rename(flat_mod)
        if flat_mod is None:
            continue
        path = tuple(flat_mod.split("/"))

        if mod in bn_modules:
            if leaf == "weight":
                _set_path(params, path + ("scale",), v)
            elif leaf == "bias":
                _set_path(params, path + ("bias",), v)
            elif leaf == "running_mean":
                _set_path(batch_stats, path + ("mean",), v)
            elif leaf == "running_var":
                _set_path(batch_stats, path + ("var",), v)
            continue

        if leaf == "weight":
            if v.ndim == 4:
                is_deconv = any(s in flat_mod for s in deconv_names)
                if is_deconv:
                    # (in, out, kh, kw) -> (kh, kw, out, in): transpose_kernel=True
                    v = v.transpose(2, 3, 1, 0)
                else:
                    v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                _set_path(params, path + ("kernel",), v)
            elif v.ndim == 1:
                # affine norm without running stats (e.g. GroupNorm)
                _set_path(params, path + ("scale",), v)
            elif v.ndim == 2:
                _set_path(params, path + ("kernel",), v.T)
            else:
                raise ValueError(f"unhandled weight shape {v.shape} at {k}")
        elif leaf == "bias":
            _set_path(params, path + ("bias",), v)
        else:
            raise ValueError(f"unhandled leaf {leaf!r} at {k}")

    out: Dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def _raft_rename(flat: str) -> str:
    """Adapt RAFT torch names to our flax tree.

    The scanned update block nests its torch content one level deeper:
    update_block.<x> -> update_block/block/<x>; downsample.0/.1 -> named convs.
    """
    flat = flat.replace("downsample_0", "downsample_conv")
    flat = flat.replace("downsample_1", "downsample_norm")
    if flat.startswith("update_block/"):
        flat = "update_block/block/" + flat[len("update_block/") :]
    # BatchNorm modules get wrapped names identical to torch (norm1 etc.) — no change.
    return flat


def convert_raft_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference RAFT .pth checkpoint and convert to flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return torch_state_dict_to_flax(sd, rename=_raft_rename)


def convert_lfn3_checkpoint(path: str) -> Dict[str, Any]:
    """Convert a LiteFlowNet3 torch/Lightning checkpoint to flax variables.

    Handles Lightning `.ckpt` dicts ({'state_dict': ...} with 'model.' prefixes,
    `train_liteflownet3.py:499-523`) and plain state_dicts; the LFN3 flax module
    names mirror the torch attribute paths so no rename is needed.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model_state_dict", "model"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    return torch_state_dict_to_flax(sd)


def check_checkpoint_compat(variables: Dict[str, Any], reference: Dict[str, Any]):
    """Key/shape compatibility report between two variable trees.

    The IFNET_load.py (:6-19) role: verify a converted checkpoint matches a
    model's initialized structure before loading. Returns
    (missing, unexpected, shape_mismatches) lists of '/'-joined paths.
    """

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flatten(v, p))
            else:
                out[p] = tuple(np.shape(v))
        return out

    a = flatten(variables)
    b = flatten(reference)
    missing = sorted(set(b) - set(a))
    unexpected = sorted(set(a) - set(b))
    mismatched = sorted(k for k in set(a) & set(b) if a[k] != b[k])
    return missing, unexpected, mismatched


def save_flax_checkpoint(variables: Dict[str, Any], path: str):
    """Save a flax variable tree as a flat .npz (portable, torch-free loading)."""
    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, p)
            else:
                flat[p] = np.asarray(v)

    walk(variables, "")
    np.savez(path, **flat)


def load_flax_checkpoint(path: str) -> Dict[str, Any]:
    """Load a .npz produced by save_flax_checkpoint back into a nested dict."""
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for k in data.files:
        _set_path(tree, tuple(k.split("/")), data[k])
    return tree
