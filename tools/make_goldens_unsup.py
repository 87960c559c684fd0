"""Golden fixtures for the UFlow/UnFlow unsupervised-loss libraries.

Runs the reference torch implementations on fixed random inputs and saves the
outputs; tests/test_unsup_losses.py compares the JAX ports against them.

Usage: python tools/make_goldens_unsup.py
"""

import os
import sys

import numpy as np

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")
OUT_DIR = os.path.join(REPO, "tests", "goldens")

sys.path.insert(0, REFERENCE)


def make_uflow():
    import torch
    import uflow_loss_pytorch as uf

    rng = np.random.RandomState(0)
    B, H, W = 2, 32, 48
    im0 = torch.from_numpy(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im1 = torch.from_numpy(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    # flows in UFlow (dy, dx) order, 3 levels
    def mkflow(scale):
        h, w = H // scale, W // scale
        return torch.from_numpy(
            rng.uniform(-4 / scale, 4 / scale, (B, h, w, 2)).astype(np.float32)
        )

    flow_fw = [mkflow(1), mkflow(2), mkflow(4)]
    flow_bw = [mkflow(1), mkflow(2), mkflow(4)]

    out = {
        "im0": im0.numpy(), "im1": im1.numpy(),
        "flow_fw_0": flow_fw[0].numpy(), "flow_fw_1": flow_fw[1].numpy(),
        "flow_fw_2": flow_fw[2].numpy(),
        "flow_bw_0": flow_bw[0].numpy(), "flow_bw_1": flow_bw[1].numpy(),
        "flow_bw_2": flow_bw[2].numpy(),
    }

    with torch.no_grad():
        # core ops
        warp = uf.flow_to_warp(flow_fw[0])
        out["warp"] = warp.numpy()
        out["resampled"] = uf.resample(im1, warp).numpy()
        out["mask_invalid"] = uf.mask_invalid(warp).numpy()
        out["range_map_1"] = uf.compute_range_map(
            flow_fw[0], downsampling_factor=1).numpy()
        out["range_map_4"] = uf.compute_range_map(
            flow_fw[0], downsampling_factor=4, reduce_downsampling_bias=True,
            resize_output=True).numpy()

        flows = {(0, 1, "augmented-student"): flow_fw, (1, 0, "augmented-student"): flow_bw}
        for est in ["brox", "wang", "wang4thres", "fb_abs"]:
            _, _, _, occ_masks, _, _ = uf.compute_warps_and_occlusion(
                flows, occlusion_estimation=est)
            out[f"occ_{est}"] = occ_masks[(0, 1, "augmented-student")][0].numpy()
        _, _, _, occ_u, _, _ = uf.compute_warps_and_occlusion(
            flows, occlusion_estimation="uflow",
            occ_weights={"fb_abs": 1000.0, "forward_collision": 1000.0, "backward_zero": 1000.0},
            occ_thresholds={"fb_abs": 1.5, "forward_collision": 0.4, "backward_zero": 0.25},
            occ_clip_max={"fb_abs": 10.0, "forward_collision": 5.0})
        out["occ_uflow"] = occ_u[(0, 1, "augmented-student")][0].numpy()

        # census + ssim
        mask = torch.from_numpy(rng.uniform(0, 1, (B, H, W, 1)).astype(np.float32))
        out["mask"] = mask.numpy()
        out["census"] = uf.census_loss(im0, im1, mask).numpy()
        ssim_err, avg_w = uf.weighted_ssim(im0, im1, mask[..., 0])
        out["ssim_err"] = ssim_err.numpy()
        out["ssim_avgw"] = avg_w.numpy()

        # full compute_loss (photo + smooth1 + smooth2 + ssim + census, wang occ)
        weights = {"photo": 1.0, "smooth1": 2.0, "smooth2": 4.0, "ssim": 0.5,
                   "census": 1.0, "edge_constant": 150.0}
        warps, valid_masks, _, occ_masks, fb_sq, fb_sum = uf.compute_warps_and_occlusion(
            flows, occlusion_estimation="wang")
        warped = uf.apply_warps_stop_grad({0: im0, 1: im1}, warps, level=0)
        losses = uf.compute_loss(
            weights, {0: im0, 1: im1}, flows, warps, valid_masks, occ_masks,
            fb_sq, fb_sum, warped, smoothness_at_level=2)
        for k, v in losses.items():
            out[f"loss_{k}"] = np.float32(v.item())

        sup = uf.supervised_loss(
            {"supervision": 1.0}, flow_fw[0],
            (torch.rand(B, H, W, 1) > 0.3).float(),
            {(0, 1, "augmented"): flow_fw})
        out["loss_supervision"] = np.float32(sup["supervision"].item())
        out["sup_valid"] = np.zeros(1)  # placeholder replaced below

    np.savez_compressed(os.path.join(OUT_DIR, "uflow_losses.npz"), **out)
    print("wrote uflow_losses.npz", len(out), "entries")


def make_uflow_supervised():
    """Regenerate supervised loss with a saved valid mask (deterministic)."""
    import torch
    import uflow_loss_pytorch as uf

    rng = np.random.RandomState(3)
    B, H, W = 2, 32, 48
    gt = torch.from_numpy(rng.uniform(-4, 4, (B, H, W, 2)).astype(np.float32))
    pred = torch.from_numpy(rng.uniform(-4, 4, (B, H // 2, W // 2, 2)).astype(np.float32))
    valid = torch.from_numpy((rng.uniform(0, 1, (B, H, W, 1)) > 0.3).astype(np.float32))
    with torch.no_grad():
        sup = uf.supervised_loss({"supervision": 1.0}, gt, valid,
                                 {(0, 1, "augmented"): [pred]})
    np.savez_compressed(
        os.path.join(OUT_DIR, "uflow_supervised.npz"),
        gt=gt.numpy(), pred=pred.numpy(), valid=valid.numpy(),
        loss=np.float32(sup["supervision"].item()),
    )
    print("wrote uflow_supervised.npz")


def _forward_warp_correct(flow):
    """Intended forward_warp semantics with true scatter-add.

    The reference's `tensor[idx] += w` silently drops duplicate-index
    contributions (torch advanced-indexing quirk) in BOTH its copies
    (`unflow_loss_pytorch.py:83-149`, `unflow_ops_pytorch.py:6-86`). Per
    SURVEY.md §7.4 we implement the intended accumulation; this oracle uses
    np.add.at which accumulates correctly.
    """
    import torch

    f = flow.numpy()
    B, H, W, _ = f.shape
    gy, gx = np.mgrid[0:H, 0:W]
    out = np.zeros((B, H, W), np.float32)
    for b in range(B):
        tx = (gx + f[b, :, :, 0]).ravel()
        ty = (gy + f[b, :, :, 1]).ravel()
        valid = (tx >= 0) & (tx < W) & (ty >= 0) & (ty < H)
        tx, ty = tx[valid], ty[valid]
        x0 = np.floor(tx).astype(np.int64)
        y0 = np.floor(ty).astype(np.int64)
        x1 = np.clip(x0 + 1, 0, W - 1)
        y1 = np.clip(y0 + 1, 0, H - 1)
        wx = tx - x0
        wy = ty - y0
        np.add.at(out[b], (y0, x0), (1 - wx) * (1 - wy))
        np.add.at(out[b], (y1, x0), (1 - wx) * wy)
        np.add.at(out[b], (y0, x1), wx * (1 - wy))
        np.add.at(out[b], (y1, x1), wx * wy)
    return torch.from_numpy(out[..., None])


def make_unflow():
    import torch
    import unflow_loss_pytorch as un
    import unflow_ops_pytorch as uo

    un.forward_warp = _forward_warp_correct
    uo.forward_warp_op = _forward_warp_correct

    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 48
    im1 = torch.from_numpy(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    im2 = torch.from_numpy(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32))
    flow_fw = torch.from_numpy(rng.uniform(-4, 4, (B, H, W, 2)).astype(np.float32))
    flow_bw = torch.from_numpy(rng.uniform(-4, 4, (B, H, W, 2)).astype(np.float32))

    out = {"im1": im1.numpy(), "im2": im2.numpy(),
           "flow_fw": flow_fw.numpy(), "flow_bw": flow_bw.numpy()}
    with torch.no_grad():
        out["image_warp"] = un.image_warp(im2, flow_fw).numpy()
        out["forward_warp"] = un.forward_warp(flow_fw).numpy()
        for tag, occ in [("none", ""), ("fb", "fb"), ("disocc", "disocc")]:
            losses = un.compute_losses(im1, im2, flow_fw, flow_bw,
                                       mask_occlusion=occ)
            for k, v in losses.items():
                out[f"loss_{tag}_{k}"] = np.float32(v.item())
        out["occ_det"] = uo.occlusion_detection(flow_fw, flow_bw).numpy()

    np.savez_compressed(os.path.join(OUT_DIR, "unflow_losses.npz"), **out)
    print("wrote unflow_losses.npz", len(out), "entries")


if __name__ == "__main__":
    os.makedirs(OUT_DIR, exist_ok=True)
    make_uflow()
    make_uflow_supervised()
    make_unflow()
