"""Parity tests for the UFlow / UnFlow unsupervised-loss libraries.

Fixtures from tools/make_goldens_unsup.py (reference torch implementations on fixed
random inputs).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from raft_optical_flow_tpu.losses import uflow as uf
from raft_optical_flow_tpu.losses import unflow as un
from raft_optical_flow_tpu.ops import unflow_ops as uo

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def ug():
    return np.load(os.path.join(GOLDENS, "uflow_losses.npz"))


@pytest.fixture(scope="module")
def ng():
    return np.load(os.path.join(GOLDENS, "unflow_losses.npz"))


def _uflow_flows(g):
    fw = [jnp.asarray(g[f"flow_fw_{i}"]) for i in range(3)]
    bw = [jnp.asarray(g[f"flow_bw_{i}"]) for i in range(3)]
    return {(0, 1, "augmented-student"): fw, (1, 0, "augmented-student"): bw}


class TestUFlowOps:
    def test_flow_to_warp_resample_mask(self, ug):
        warp = uf.flow_to_warp(jnp.asarray(ug["flow_fw_0"]))
        np.testing.assert_allclose(np.asarray(warp), ug["warp"], atol=1e-5)
        res = uf.resample(jnp.asarray(ug["im1"]), warp)
        np.testing.assert_allclose(np.asarray(res), ug["resampled"], atol=1e-5)
        m = uf.mask_invalid(warp)
        np.testing.assert_allclose(np.asarray(m), ug["mask_invalid"], atol=1e-6)

    def test_range_maps(self, ug):
        rm1 = uf.compute_range_map(jnp.asarray(ug["flow_fw_0"]), 1)
        np.testing.assert_allclose(np.asarray(rm1), ug["range_map_1"], atol=1e-4)
        rm4 = uf.compute_range_map(jnp.asarray(ug["flow_fw_0"]), 4, True, True)
        np.testing.assert_allclose(np.asarray(rm4), ug["range_map_4"], atol=1e-4)

    @pytest.mark.parametrize("est", ["brox", "wang", "wang4thres", "fb_abs"])
    def test_occlusion_estimators(self, ug, est):
        flows = _uflow_flows(ug)
        _, _, _, occ, _, _ = uf.compute_warps_and_occlusion(flows, est)
        np.testing.assert_allclose(
            np.asarray(occ[(0, 1, "augmented-student")][0]), ug[f"occ_{est}"],
            atol=1e-4,
        )

    def test_occlusion_uflow(self, ug):
        flows = _uflow_flows(ug)
        _, _, _, occ, _, _ = uf.compute_warps_and_occlusion(
            flows, "uflow",
            occ_weights={"fb_abs": 1000.0, "forward_collision": 1000.0,
                         "backward_zero": 1000.0},
            occ_thresholds={"fb_abs": 1.5, "forward_collision": 0.4,
                            "backward_zero": 0.25},
            occ_clip_max={"fb_abs": 10.0, "forward_collision": 5.0},
        )
        np.testing.assert_allclose(
            np.asarray(occ[(0, 1, "augmented-student")][0]), ug["occ_uflow"],
            atol=1e-4,
        )

    def test_census_and_ssim(self, ug):
        im0 = jnp.asarray(ug["im0"])
        im1 = jnp.asarray(ug["im1"])
        mask = jnp.asarray(ug["mask"])
        c = uf.census_loss(im0, im1, mask)
        np.testing.assert_allclose(float(c), float(ug["census"]), rtol=1e-4)
        err, avg_w = uf.weighted_ssim(im0, im1, mask[..., 0])
        np.testing.assert_allclose(np.asarray(err), ug["ssim_err"], atol=1e-4)
        np.testing.assert_allclose(np.asarray(avg_w), ug["ssim_avgw"], atol=1e-5)

    def test_compute_loss_full(self, ug):
        flows = _uflow_flows(ug)
        im = {0: jnp.asarray(ug["im0"]), 1: jnp.asarray(ug["im1"])}
        weights = {"photo": 1.0, "smooth1": 2.0, "smooth2": 4.0, "ssim": 0.5,
                   "census": 1.0, "edge_constant": 150.0}
        warps, valid, _, occ, fb_sq, fb_sum = uf.compute_warps_and_occlusion(
            flows, "wang")
        warped = uf.apply_warps_stop_grad(im, warps, level=0)
        losses = uf.compute_loss(weights, im, flows, warps, valid, occ,
                                 fb_sq, fb_sum, warped, smoothness_at_level=2)
        for k in ["photo", "smooth1", "smooth2", "ssim", "census", "total"]:
            np.testing.assert_allclose(
                float(losses[k]), float(ug[f"loss_{k}"]), rtol=2e-3,
                err_msg=f"loss_{k}",
            )

    def test_supervised_loss(self):
        g = np.load(os.path.join(GOLDENS, "uflow_supervised.npz"))
        losses = uf.supervised_loss(
            {"supervision": 1.0}, jnp.asarray(g["gt"]), jnp.asarray(g["valid"]),
            {(0, 1, "augmented"): [jnp.asarray(g["pred"])]},
        )
        np.testing.assert_allclose(float(losses["supervision"]), float(g["loss"]),
                                   rtol=1e-4)


class TestUnFlow:
    def test_image_warp(self, ng):
        w = un.image_warp(jnp.asarray(ng["im2"]), jnp.asarray(ng["flow_fw"]))
        np.testing.assert_allclose(np.asarray(w), ng["image_warp"], atol=1e-5)

    def test_forward_warp(self, ng):
        fw = un.forward_warp(jnp.asarray(ng["flow_fw"]))
        np.testing.assert_allclose(np.asarray(fw), ng["forward_warp"], atol=1e-4)

    @pytest.mark.parametrize("tag,occ", [("none", ""), ("fb", "fb"),
                                         ("disocc", "disocc")])
    def test_compute_losses(self, ng, tag, occ):
        losses = un.compute_losses(
            jnp.asarray(ng["im1"]), jnp.asarray(ng["im2"]),
            jnp.asarray(ng["flow_fw"]), jnp.asarray(ng["flow_bw"]),
            mask_occlusion=occ,
        )
        for k, v in losses.items():
            np.testing.assert_allclose(
                float(v), float(ng[f"loss_{tag}_{k}"]), rtol=2e-3,
                err_msg=f"{tag}/{k}",
            )

    def test_occlusion_detection(self, ng):
        m = uo.occlusion_detection(jnp.asarray(ng["flow_fw"]),
                                   jnp.asarray(ng["flow_bw"]))
        np.testing.assert_allclose(np.asarray(m), ng["occ_det"], atol=1e-4)
