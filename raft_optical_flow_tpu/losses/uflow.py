"""UFlow unsupervised-loss library (JAX/NHWC port of the reference's TF-port).

Parity target: `uflow_loss_pytorch.py` —
  - resampler / resample / flow_to_warp / mask_invalid (:9-190)
  - compute_range_map forward-warp occupancy (:192-292)
  - compute_warps_and_occlusion with estimators {none, brox, fb_abs, wang, wang4,
    wangthres, wang4thres, uflow} (:295-422)
  - upsample / downsample / resize incl. mask-normalized sparse resize (:434-601)
  - robust_l1 / abs_robust_loss / image_grads / distance metrics (:604-640)
  - compute_loss: photo + smooth1/smooth2 (edge weighted) + weighted SSIM + census
    + selfsup student/teacher (:643-795); supervised_loss (:798-816)
  - census transform + soft hamming (:869-944); weighted_ssim (:990-1034)
  - random_crop / random_shift selfsup augmentations (:819-866)

CONVENTION: this module follows UFlow's (y, x) ordering — flow channels are
(dy, dx) and warp coordinates are (y, x) — unlike the rest of the repo which is
(x, y). Adapters at the trainer level flip channels once.

TPU notes: the resampler is ops/grid.bilinear_sampler (one packed-tap gather); the
range-map scatter uses Array.at[].add (deterministic sorted scatter in XLA); all
reductions are mask-weighted (no boolean indexing) so everything jits.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from raft_optical_flow_tpu.ops.grid import bilinear_sampler, resize_bilinear


# ----------------------------------------------------------------------------- ops


def resample(source: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample `source` at (y, x) coords; OOB taps are zero.

    source: [B, H, W, C]; coords: [B, ..., 2] with channels (y, x).
    """
    return bilinear_sampler(source, coords[..., ::-1], padding="zeros")


def flow_to_warp(flow: jax.Array) -> jax.Array:
    """warp = grid + flow, (y, x) order. flow: [B, H, W, 2] = (dy, dx)."""
    H, W = flow.shape[-3:-1]
    gy = jax.lax.broadcasted_iota(flow.dtype, (H, W), 0)
    gx = jax.lax.broadcasted_iota(flow.dtype, (H, W), 1)
    grid = jnp.stack([gy, gx], axis=-1)
    return grid[None] + flow


def mask_invalid(coords: jax.Array) -> jax.Array:
    """1 where (y, x) coords are inside the image, else 0. -> [B, H, W, 1]."""
    max_y = coords.shape[-3] - 1.0
    max_x = coords.shape[-2] - 1.0
    mask = (
        (coords[..., 0] >= 0.0)
        & (coords[..., 0] <= max_y)
        & (coords[..., 1] >= 0.0)
        & (coords[..., 1] <= max_x)
    )
    return mask.astype(coords.dtype)[..., None]


def upsample(img: jax.Array, is_flow: bool) -> jax.Array:
    """2x bilinear upsample; flow values doubled (`uflow_loss_pytorch.py:434-459`)."""
    H, W = img.shape[1:3]
    out = resize_bilinear(img, (2 * H, 2 * W))
    return out * 2.0 if is_flow else out


def downsample(img: jax.Array, is_flow: bool) -> jax.Array:
    """2x bilinear downsample; flow values halved."""
    H, W = img.shape[1:3]
    out = resize_bilinear(img, (H // 2, W // 2))
    return out / 2.0 if is_flow else out


def resize(
    img: jax.Array,
    height: int,
    width: int,
    is_flow: bool,
    mask: Optional[jax.Array] = None,
):
    """Bilinear resize; optional mask-normalized sparse resize; flow values scaled
    per-axis by (h_ratio, w_ratio) applied to (dy, dx) (`uflow_loss_pytorch.py:475-560`)."""
    orig_h, orig_w = img.shape[-3:-1]
    if orig_h == height and orig_w == width:
        return (img, mask) if mask is not None else img

    if mask is not None:
        img_r = resize_bilinear(img * mask, (height, width))
        mask_r = resize_bilinear(mask, (height, width))
        img_r = img_r / (mask_r + 1e-8)
        mask_out = (mask_r > 0).astype(img.dtype)
    else:
        img_r = resize_bilinear(img, (height, width))

    if is_flow:
        scaling = jnp.array(
            [height / orig_h, width / orig_w], img_r.dtype
        )
        img_r = img_r * scaling
    if mask is not None:
        return img_r, mask_out
    return img_r


def compute_range_map(
    flow: jax.Array,
    downsampling_factor: int = 1,
    reduce_downsampling_bias: bool = True,
    resize_output: bool = True,
) -> jax.Array:
    """Forward-warp occupancy: how often each target pixel is sampled.

    flow: [B, H, W, 2] (dy, dx). Returns [B, H, W, 1] (or the downsampled size if
    resize_output=False). Parity: `uflow_loss_pytorch.py:192-292`.
    """
    B, in_h, in_w, _ = flow.shape
    out_h = in_h // downsampling_factor
    out_w = in_w // downsampling_factor

    if downsampling_factor > 1:
        if reduce_downsampling_bias:
            p = downsampling_factor // 2
            for _ in range(p):
                flow = jnp.pad(
                    flow, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect"
                )
            coords = flow_to_warp(flow) - p
        else:
            coords = flow_to_warp(flow)
        coords = (coords + (1 - downsampling_factor) * 0.5) / downsampling_factor
    else:
        coords = flow_to_warp(flow)

    fh, fw = coords.shape[1:3]
    cf = jnp.floor(coords)
    off = coords - cf
    cf = cf.astype(jnp.int32)
    y0 = cf[..., 0].reshape(B, -1)
    x0 = cf[..., 1].reshape(B, -1)
    wy = off[..., 0].reshape(B, -1)
    wx = off[..., 1].reshape(B, -1)

    counts = jnp.zeros((B, out_h * out_w), flow.dtype)
    batch_idx = jnp.arange(B)[:, None]
    for di in range(2):
        for dj in range(2):
            yi = y0 + di
            xi = x0 + dj
            inb = (yi >= 0) & (yi < out_h) & (xi >= 0) & (xi < out_w)
            idx = jnp.clip(yi, 0, out_h - 1) * out_w + jnp.clip(xi, 0, out_w - 1)
            w = ((1.0 - di) - ((-1.0) ** di) * wy) * ((1.0 - dj) - ((-1.0) ** dj) * wx)
            counts = counts.at[batch_idx, idx].add(jnp.where(inb, w, 0.0))
    count_image = counts.reshape(B, out_h, out_w, 1)

    if downsampling_factor > 1:
        count_image = count_image / downsampling_factor**2
        if resize_output:
            count_image = resize(count_image, in_h, in_w, is_flow=False)
    return count_image


# ---------------------------------------------------------------- occlusion masks


def compute_warps_and_occlusion(
    flows: Dict[tuple, List[jax.Array]],
    occlusion_estimation: str,
    occ_weights: Optional[Dict[str, float]] = None,
    occ_thresholds: Optional[Dict[str, float]] = None,
    occ_clip_max: Optional[Dict[str, float]] = None,
    occlusions_are_zeros: bool = True,
    occ_active: Optional[Dict[str, bool]] = None,
):
    """Warps, validity masks, range maps, occlusion masks, fb stats.

    flows: {(i, j, tag): [flow per level]} with both (i, j) and (j, i) present.
    Parity: `uflow_loss_pytorch.py:295-422`.
    """
    warps, range_low, occ_masks, valid_masks = {}, {}, {}, {}
    fb_sq_diff, fb_sum_sq = {}, {}

    for key in flows:
        i, j, t = key
        rev_key = (j, i, t)
        warps[key] = []
        occ_masks[key] = []
        valid_masks[key] = []
        fb_sq_diff[key] = []
        fb_sum_sq[key] = []
        range_low.setdefault(rev_key, [])

        for level in range(min(3, len(flows[key]))):
            flow_ij = flows[key][level]
            flow_ji = flows[rev_key][level]
            warps[key].append(flow_to_warp(flow_ij))
            valid_masks[key].append(mask_invalid(warps[key][level]))
            flow_ji_in_i = resample(flow_ji, warps[key][level])
            fb_sq_diff[key].append(
                jnp.sum((flow_ij + flow_ji_in_i) ** 2, axis=-1, keepdims=True)
            )
            fb_sum_sq[key].append(
                jnp.sum(flow_ij**2 + flow_ji_in_i**2, axis=-1, keepdims=True)
            )
            if level != 0:
                continue

            occ = jnp.zeros_like(flow_ij[..., :1])
            scores = {
                "forward_collision": jnp.zeros_like(occ),
                "backward_zero": jnp.zeros_like(occ),
                "fb_abs": jnp.zeros_like(occ),
            }
            est = occlusion_estimation
            if est == "none" or (occ_active is not None and not occ_active.get(est, True)):
                pass
            elif est == "brox":
                occ = (
                    fb_sq_diff[key][level] > 0.01 * fb_sum_sq[key][level] + 0.5
                ).astype(flow_ij.dtype)
            elif est == "fb_abs":
                occ = (fb_sq_diff[key][level] ** 0.5 > 1.5).astype(flow_ij.dtype)
            elif est in ("wang", "wang4", "wangthres", "wang4thres"):
                df = 4 if "4" in est else 1
                rm = compute_range_map(
                    flow_ji,
                    downsampling_factor=df,
                    reduce_downsampling_bias=(est != "wang"),
                    resize_output=(est != "wang"),
                )
                range_low[rev_key].append(rm)
                if "thres" in est:
                    occ = (rm < 0.75).astype(flow_ij.dtype)
                else:
                    occ = 1.0 - jnp.clip(rm, 0.0, 1.0)
            elif est == "uflow":
                logits = jnp.zeros_like(occ)
                if "forward_collision" in occ_weights and (
                    occ_active is None or occ_active.get("forward_collision", True)
                ):
                    rm_fwd = compute_range_map(flow_ij, 1, True, True)
                    fwd_in_i = resample(rm_fwd, warps[key][level])
                    scores["forward_collision"] = (
                        jnp.clip(fwd_in_i, 1.0, occ_clip_max["forward_collision"]) - 1.0
                    )
                if "backward_zero" in occ_weights and (
                    occ_active is None or occ_active.get("backward_zero", True)
                ):
                    rm = compute_range_map(flow_ji, 4, True, True)
                    range_low[rev_key].append(rm)
                    scores["backward_zero"] = 1.0 - jnp.clip(rm, 0.0, 1.0)
                if "fb_abs" in occ_weights and (
                    occ_active is None or occ_active.get("fb_abs", True)
                ):
                    scores["fb_abs"] = jnp.clip(
                        fb_sq_diff[key][level] ** 0.5, 0.0, occ_clip_max["fb_abs"]
                    )
                for k, v in scores.items():
                    logits = logits + (v - occ_thresholds[k]) * occ_weights[k]
                occ = jax.nn.sigmoid(logits)
            else:
                raise ValueError(f"Unknown occlusion_estimation {est!r}")
            occ_masks[key].append(1.0 - occ if occlusions_are_zeros else occ)

    return warps, valid_masks, range_low, occ_masks, fb_sq_diff, fb_sum_sq


def apply_warps_stop_grad(
    sources: Dict[int, jax.Array], warps: Dict[tuple, List[jax.Array]], level: int
):
    """Warp each source image; gradients flow through the warp only (`:424-431`)."""
    return {
        (i, j, t): resample(jax.lax.stop_gradient(sources[j]), warps[(i, j, t)][level])
        for (i, j, t) in warps
    }


# ---------------------------------------------------------------------- metrics


def l1(x):
    return jnp.abs(x)


def robust_l1(x):
    """(x^2 + 0.001^2)^0.5 (`uflow_loss_pytorch.py:604-606`)."""
    return (x**2 + 0.001**2) ** 0.5


def abs_robust_loss(diff, eps=0.01, q=0.4):
    """DDFlow robust loss (|d| + eps)^q (`:609-611`)."""
    return jnp.power(jnp.abs(diff) + eps, q)


def image_grads(image_batch: jax.Array, stride: int = 1):
    gh = image_batch[:, stride:] - image_batch[:, :-stride]
    gw = image_batch[:, :, stride:] - image_batch[:, :, :-stride]
    return gh, gw


def get_distance_metric_fns(distance_metrics: Dict[str, str]) -> Dict[str, Callable]:
    table = {"l1": l1, "robust_l1": robust_l1, "ddflow": abs_robust_loss}
    return {k: table[v] for k, v in distance_metrics.items()}


# ------------------------------------------------------------------------ census


def zero_mask_border(mask_bhw3: jax.Array, patch_size: int) -> jax.Array:
    p = patch_size // 2
    inner = mask_bhw3[:, p:-p, p:-p, :]
    return jnp.pad(inner, ((0, 0), (p, p), (p, p), (0, 0)))


def census_transform(image: jax.Array, patch_size: int) -> jax.Array:
    """Soft census transform (`uflow_loss_pytorch.py:888-907`). image: [B,H,W,C]."""
    intensities = jnp.mean(image, axis=-1, keepdims=True) * 255.0
    B, H, W, _ = intensities.shape
    p = patch_size // 2
    padded = jnp.pad(intensities[..., 0], ((0, 0), (p, p), (p, p)))
    # neighbors[k] = intensity at offset (ky, kx), row-major like the eye-kernel conv
    taps = [
        padded[:, ky : ky + H, kx : kx + W]
        for ky in range(patch_size)
        for kx in range(patch_size)
    ]
    neighbors = jnp.stack(taps, axis=-1)
    diff = neighbors - intensities
    return diff / jnp.sqrt(0.81 + jnp.square(diff))


def soft_hamming(a_bhwk, b_bhwk, thresh=0.1):
    sq = jnp.square(a_bhwk - b_bhwk)
    return jnp.sum(sq / (thresh + sq), axis=3, keepdims=True)


def census_loss(
    image_a, image_b, mask_bhw3, patch_size=7, distance_metric_fn=abs_robust_loss
):
    ca = census_transform(image_a, patch_size)
    cb = census_transform(image_b, patch_size)
    hamming = soft_hamming(ca, cb)
    padded_mask = zero_mask_border(mask_bhw3, patch_size)
    diff = distance_metric_fn(hamming) * padded_mask
    return jnp.sum(diff) / (jnp.sum(jax.lax.stop_gradient(padded_mask)) + 1e-6)


# -------------------------------------------------------------------------- ssim


def _avg_pool3x3(x: jax.Array) -> jax.Array:
    """3x3/s1 VALID average pool over [B, H, W, C]."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "VALID"
    ) / 9.0


def weighted_ssim(x, y, weight, c1=float("inf"), c2=9e-6, weight_epsilon=0.01):
    """Weighted SSIM (`uflow_loss_pytorch.py:990-1034`). weight: [B, H, W]."""
    if c1 == float("inf") and c2 == float("inf"):
        raise ValueError("Both c1 and c2 are infinite, SSIM loss is zero.")
    weight = weight[..., None]
    avg_w = _avg_pool3x3(weight)
    w_plus = weight + weight_epsilon
    inv_avg_w = 1.0 / (avg_w + weight_epsilon)

    def wpool(z):
        return _avg_pool3x3(z * w_plus) * inv_avg_w

    mu_x = wpool(x)
    mu_y = wpool(y)
    sigma_x = wpool(x**2) - mu_x**2
    sigma_y = wpool(y**2) - mu_y**2
    sigma_xy = wpool(x * y) - mu_x * mu_y
    if c1 == float("inf"):
        ssim_n = 2 * sigma_xy + c2
        ssim_d = sigma_x + sigma_y + c2
    elif c2 == float("inf"):
        ssim_n = 2 * mu_x * mu_y + c1
        ssim_d = mu_x**2 + mu_y**2 + c1
    else:
        ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
        ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0), avg_w


# ----------------------------------------------------------- selfsup augmentations


def random_crop(key, batch, max_offset_height=32, max_offset_width=32):
    """Random crop per batch element; returns (cropped, offsets [B, 2])."""
    B, H, W, C = batch.shape
    th = H - max_offset_height
    tw = W - max_offset_width
    k1, k2 = jax.random.split(key)
    oh = jax.random.randint(k1, (B,), 0, max_offset_height + 1)
    ow = jax.random.randint(k2, (B,), 0, max_offset_width + 1)

    def crop_one(img, h0, w0):
        return jax.lax.dynamic_slice(img, (h0, w0, 0), (th, tw, C))

    cropped = jax.vmap(crop_one)(batch, oh, ow)
    return cropped, jnp.stack([oh, ow], axis=-1)


def random_shift(key, batch, max_shift_height=32, max_shift_width=32):
    """Random circular shift per batch element; returns (shifted, shifts [B, 2])."""
    B = batch.shape[0]
    k1, k2 = jax.random.split(key)
    sh = jax.random.randint(k1, (B,), -max_shift_height, max_shift_height + 1)
    sw = jax.random.randint(k2, (B,), -max_shift_width, max_shift_width + 1)

    def shift_one(img, s0, s1):
        return jnp.roll(img, (s0, s1), axis=(0, 1))

    shifted = jax.vmap(shift_one)(batch, sh, sw)
    return shifted, jnp.stack([sh, sw], axis=-1)


def selfsup_crop_transforms(crop_height: int, crop_width: int):
    """Per-level selfsup transforms: a fixed border crop (student frame).

    UFlow's self-supervision (`uflow_loss_pytorch.py:540-585` usage): a teacher
    runs on the full images, a student on a cropped view; the teacher's flow —
    transformed into the student frame by these functions — supervises the
    student where the teacher is confident. A fixed crop keeps everything
    static-shaped under jit; flow VALUES are unchanged by cropping (the
    is_flow flag exists for transforms that rescale, e.g. zoom).

    Returns [fn_level0, fn_level1, fn_level2]; fn(x, i_or_ij, is_flow) crops x
    by crop/2^level on each side.
    """

    def make_fn(level):
        ch = crop_height >> level
        cw = crop_width >> level

        def fn(x, i_or_ij=None, is_flow=False):
            del i_or_ij, is_flow
            return x[:, ch : x.shape[1] - ch, cw : x.shape[2] - cw]

        return fn

    return [make_fn(level) for level in range(3)]


# ------------------------------------------------------------------- main losses


def compute_loss(
    weights: Dict[str, float],
    images: Dict[int, jax.Array],
    flows: Dict[tuple, List[jax.Array]],
    warps: Dict[tuple, List[jax.Array]],
    valid_warp_masks: Dict[tuple, List[jax.Array]],
    not_occluded_masks: Dict[tuple, List[jax.Array]],
    fb_sq_diff: Dict[tuple, List[jax.Array]],
    fb_sum_sq: Dict[tuple, List[jax.Array]],
    warped_images: Dict[tuple, jax.Array],
    only_forward: bool = False,
    selfsup_transform_fns=None,
    fb_sigma_teacher: float = 0.003,
    fb_sigma_student: float = 0.03,
    distance_metrics: Optional[Dict[str, str]] = None,
    smoothness_edge_weighting: str = "gaussian",
    stop_gradient_mask: bool = True,
    selfsup_mask: str = "gaussian",
    ground_truth_occlusions: Optional[jax.Array] = None,
    smoothness_at_level: int = 2,
) -> Dict[str, jax.Array]:
    """UFlow total loss (`uflow_loss_pytorch.py:643-795`). Returns a dict of terms."""
    if distance_metrics is None:
        distance_metrics = {"photo": "robust_l1", "census": "ddflow"}
    metric_fns = get_distance_metric_fns(distance_metrics)
    losses = {k: 0.0 for k in weights if k != "edge_constant"}

    compute_for = ["augmented-student"]
    num_pairs = sum(1.0 for (i, j, c) in warps if c in compute_for)

    for key in warps:
        i, j, c = key
        if c not in compute_for or (only_forward and i > j):
            continue

        if ground_truth_occlusions is None:
            mask_level0 = not_occluded_masks[key][0] * valid_warp_masks[key][0]
            if stop_gradient_mask:
                mask_level0 = jax.lax.stop_gradient(mask_level0)
        else:
            if i > j:
                continue
            gt_not_occ = 1.0 - ground_truth_occlusions.astype(jnp.float32)
            mask_level0 = jax.lax.stop_gradient(gt_not_occ * valid_warp_masks[key][0])

        if "photo" in weights:
            error = metric_fns["photo"](images[i] - warped_images[key])
            losses["photo"] += (
                weights["photo"]
                * jnp.sum(mask_level0 * error)
                / (jnp.sum(mask_level0) + 1e-16)
                / num_pairs
            )

        if "smooth1" in weights or "smooth2" in weights:
            edge_constant = weights.get("edge_constant", 0.0)
            if smoothness_edge_weighting == "gaussian":
                abs_fn = lambda x: x**2  # noqa: E731
            elif smoothness_edge_weighting == "exponential":
                abs_fn = jnp.abs
            else:
                raise ValueError(smoothness_edge_weighting)
            img0 = images[i]
            H, W = img0.shape[-3:-1]
            img1 = resize(img0, H // 2, W // 2, is_flow=False)
            img2 = resize(img1, H // 4, W // 4, is_flow=False)
            images_at_level = [img0, img1, img2]

            if "smooth1" in weights:
                gx, gy = image_grads(images_at_level[smoothness_at_level])
                wx = jnp.exp(-jnp.mean(abs_fn(edge_constant * gx), -1, keepdims=True))
                wy = jnp.exp(-jnp.mean(abs_fn(edge_constant * gy), -1, keepdims=True))
                fgx, fgy = image_grads(flows[key][smoothness_at_level])
                losses["smooth1"] += (
                    weights["smooth1"]
                    * (jnp.mean(wx * robust_l1(fgx)) + jnp.mean(wy * robust_l1(fgy)))
                    / 2.0
                    / num_pairs
                )
            if "smooth2" in weights:
                gx, gy = image_grads(images_at_level[smoothness_at_level], stride=2)
                wxx = jnp.exp(-jnp.mean(abs_fn(edge_constant * gx), -1, keepdims=True))
                wyy = jnp.exp(-jnp.mean(abs_fn(edge_constant * gy), -1, keepdims=True))
                fgx, fgy = image_grads(flows[key][smoothness_at_level])
                fgxx, _ = image_grads(fgx)
                _, fgyy = image_grads(fgy)
                losses["smooth2"] += (
                    weights["smooth2"]
                    * (jnp.mean(wxx * robust_l1(fgxx)) + jnp.mean(wyy * robust_l1(fgyy)))
                    / 2.0
                    / num_pairs
                )

        if "ssim" in weights:
            ssim_error, avg_w = weighted_ssim(
                warped_images[key], images[i], mask_level0[..., 0]
            )
            losses["ssim"] += weights["ssim"] * (
                jnp.sum(ssim_error * avg_w) / (jnp.sum(avg_w) + 1e-16) / num_pairs
            )

        if "census" in weights:
            losses["census"] += (
                weights["census"]
                * census_loss(
                    images[i], warped_images[key], mask_level0,
                    distance_metric_fn=metric_fns["census"],
                )
                / num_pairs
            )

        if "selfsup" in weights:
            assert selfsup_transform_fns is not None
            _, h, w, _ = flows[key][2].shape
            teacher_flow = flows[(i, j, "original-teacher")][2]
            student_flow = flows[(i, j, "transformed-student")][2]
            teacher_flow = selfsup_transform_fns[2](
                teacher_flow, i_or_ij=(i, j), is_flow=True
            )
            if selfsup_mask == "gaussian":
                stu_fb = jnp.exp(
                    -fb_sq_diff[(i, j, "transformed-student")][2]
                    / (fb_sigma_student**2 * (h**2 + w**2))
                )
                tea_fb = jnp.exp(
                    -fb_sq_diff[(i, j, "original-teacher")][2]
                    / (fb_sigma_teacher**2 * (h**2 + w**2))
                )
            elif selfsup_mask == "advection":
                stu_fb = not_occluded_masks[(i, j, "transformed-student")][2]
                tea_fb = not_occluded_masks[(i, j, "original-teacher")][2]
            elif selfsup_mask == "ddflow":
                thr_s = 0.01 * fb_sum_sq[(i, j, "transformed-student")][2] + 0.5
                thr_t = 0.01 * fb_sum_sq[(i, j, "original-teacher")][2] + 0.5
                stu_fb = (
                    fb_sq_diff[(i, j, "transformed-student")][2] < thr_s
                ).astype(jnp.float32)
                tea_fb = (
                    fb_sq_diff[(i, j, "original-teacher")][2] < thr_t
                ).astype(jnp.float32)
            else:
                raise ValueError(f"Unknown selfsup_mask {selfsup_mask!r}")
            student_mask = 1.0 - (
                stu_fb * valid_warp_masks[(i, j, "transformed-student")][2]
            )
            teacher_mask = tea_fb * valid_warp_masks[(i, j, "original-teacher")][2]
            teacher_mask = selfsup_transform_fns[2](
                teacher_mask, i_or_ij=(i, j), is_flow=False
            )
            error = robust_l1(jax.lax.stop_gradient(teacher_flow) - student_flow)
            mask = jax.lax.stop_gradient(teacher_mask * student_mask)
            losses["selfsup"] += (
                weights["selfsup"]
                * jnp.sum(mask * error)
                / (jnp.sum(jnp.ones_like(mask)) + 1e-16)
                / num_pairs
            )

    losses["total"] = sum(losses.values())
    return losses


def supervised_loss(weights, ground_truth_flow, ground_truth_valid, predicted_flows):
    """Masked robust-L1 supervision (`uflow_loss_pytorch.py:798-816`)."""
    predicted_flow = predicted_flows[(0, 1, "augmented")][0]
    _, H, W, _ = ground_truth_flow.shape
    predicted_flow = resize(predicted_flow, H, W, is_flow=True)
    error = robust_l1(ground_truth_flow - predicted_flow)
    if ground_truth_valid is None:
        ground_truth_valid = jnp.ones(ground_truth_flow.shape[:-1] + (1,), jnp.float32)
    losses = {
        "supervision": weights["supervision"]
        * jnp.sum(ground_truth_valid * error)
        / (jnp.sum(ground_truth_valid) + 1e-16)
    }
    losses["total"] = losses["supervision"]
    return losses
