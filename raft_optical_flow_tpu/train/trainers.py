"""Trainers for the LiteFlowNet3 / SimpleFlowNet / IFNet families (sup + unsup).

Parity targets:
  - `train_liteflownet3.py:477-478` — Adam(lr, wd=1e-4) + StepLR(gamma 0.5); loss =
    multiscale SequenceLoss on [final] + reversed(div_flow-scaled pyramid) (:206-252).
  - `train_simple_flow.py:85-95,279` — AdamW + StepLR + grad clip 1.0;
    SimpleFlowLoss (multi-scale EPE + edge-aware smoothness).
  - `IFNET_train.py:88-95,256,288-299` — same optimizer family; supervised loss on
    flow[..., 2:4] (the img1 -> img0 direction) via SimpleFlowLoss, or `--unsuper`
    laploss on the warped-image cascade.
  - `train_simple_flow_unsupervised.py` / `train_liteflownet3_unsupervised.py` —
    bidirectional forward/backward model passes + multi-scale unsupervised loss.

SPMD layout is identical to the RAFT trainer: batch sharded over the mesh 'data'
axis, params replicated, gradient psum inserted by XLA.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from raft_optical_flow_tpu.losses.laploss import laploss
from raft_optical_flow_tpu.losses.sequence import multiscale_sequence_loss
from raft_optical_flow_tpu.losses.simple_flow_loss import simple_flow_loss
from raft_optical_flow_tpu.losses.unsupervised import unsupervised_loss
from raft_optical_flow_tpu.models.ifnet import IFNet
from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3
from raft_optical_flow_tpu.models.simple_flow import SimpleFlowConfig, SimpleFlowNet
from raft_optical_flow_tpu.parallel.mesh import make_mesh, shard_batch
from raft_optical_flow_tpu.train.trainer import MetricLogger, TrainState


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Adam/AdamW + StepLR, the reference's non-RAFT optimizer family."""

    lr: float = 1e-4
    weight_decay: float = 1e-4
    adamw: bool = True  # reference: AdamW for simple_flow/ifnet, Adam for lfn3
    step_size: int = 10_000  # StepLR period in steps (reference steps per epoch)
    lr_gamma: float = 0.5
    clip: float = 1.0


def make_step_optimizer(cfg: OptimConfig):
    schedule = optax.exponential_decay(
        cfg.lr, transition_steps=cfg.step_size, decay_rate=cfg.lr_gamma,
        staircase=True,
    )
    if cfg.adamw:
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    else:
        # torch Adam(weight_decay) is L2 regularization added to the gradient
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay), optax.adam(schedule)
        )
    tx = optax.chain(optax.clip_by_global_norm(cfg.clip), opt)
    return tx, schedule


def _variables(state: TrainState) -> Dict:
    v = {"params": state.params}
    if state.batch_stats:
        v["batch_stats"] = state.batch_stats
    return v


# ----------------------------------------------------------------- train steps


def lfn3_train_step(state, batch, *, config: LFN3Config):
    """Supervised LFN3 step. batch images are 0-255; model takes [0, 1]."""
    model = LiteFlowNet3(config)
    images = jnp.stack([batch["image1"], batch["image2"]], axis=1) / 255.0

    def loss_fn(params):
        out = model.apply({"params": params}, images, training=True)
        preds = [out["flows"][:, 0]] + [
            p * config.div_flow for p in reversed(out["flow_preds"])
        ]
        loss = multiscale_sequence_loss(preds, batch["flow"], batch["valid"])
        epe = jnp.sqrt(jnp.sum((out["flows"][:, 0] - batch["flow"]) ** 2, -1))
        vmask = batch["valid"]
        metrics = {"epe": jnp.sum(epe * vmask) / jnp.maximum(jnp.sum(vmask), 1.0)}
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


def lfn3_unsup_train_step(state, batch, *, config: LFN3Config):
    """Unsupervised LFN3: fw + bw passes, multi-scale photometric/smooth/consist
    (`train_liteflownet3_unsupervised.py` intent)."""
    model = LiteFlowNet3(config)
    img1 = batch["image1"] / 255.0
    img2 = batch["image2"] / 255.0

    def run(params, a, b):
        out = model.apply(
            {"params": params}, jnp.stack([a, b], axis=1), training=True
        )
        # finest-first pixel-unit pyramid + final full-res flow
        preds = [out["flows"][:, 0]] + [
            p * config.div_flow for p in reversed(out["flow_preds"])
        ]
        return preds

    def loss_fn(params):
        preds_fw = run(params, img1, img2)
        preds_bw = run(params, img2, img1)
        loss, metrics = unsupervised_loss(
            img1, img2, preds_fw, preds_bw,
            scale_weights=(0.32, 0.08, 0.02, 0.01, 0.005),
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


def simple_flow_train_step(state, batch, *, config: SimpleFlowConfig):
    """Supervised SimpleFlowNet step (`train_simple_flow.py`). Images 0-255 -> [0,1]."""
    model = SimpleFlowNet(config)
    img1 = batch["image1"] / 255.0
    img2 = batch["image2"] / 255.0

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds, mut = model.apply(
            variables, img1, img2, train=True, mutable=["batch_stats"]
        )
        loss, metrics = simple_flow_loss(preds, batch["flow"], batch["valid"], img1)
        return loss, (metrics, mut["batch_stats"])

    (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


def simple_flow_unsup_train_step(state, batch, *, config: SimpleFlowConfig):
    """Unsupervised SimpleFlowNet: fw + bw passes
    (`train_simple_flow_unsupervised.py:400-410`)."""
    model = SimpleFlowNet(config)
    img1 = batch["image1"] / 255.0
    img2 = batch["image2"] / 255.0

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        preds_fw, mut = model.apply(
            variables, img1, img2, train=True, mutable=["batch_stats"]
        )
        variables = {"params": params, "batch_stats": mut["batch_stats"]}
        preds_bw, mut = model.apply(
            variables, img2, img1, train=True, mutable=["batch_stats"]
        )
        loss, metrics = unsupervised_loss(img1, img2, preds_fw, preds_bw)
        return loss, (metrics, mut["batch_stats"])

    (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


def uflow_unsup_train_step(
    state,
    batch,
    *,
    config=None,
    weights: Optional[Dict[str, float]] = None,
    selfsup_crop: int = 8,
    iters: int = 4,
    occlusion_estimation: str = "wang",
    occlusion_warmup_steps: int = 100,
    selfsup_ramp_steps: int = 400,
    sequence_gamma: float = 0.8,
):
    """UFlow-style unsupervised step on RAFT-small: census + edge-aware smooth2 +
    self-supervision (`uflow_loss_pytorch.py:643-795`, the loss library the
    reference ports but never wires into a driver).

    Student/teacher scheme: the teacher flows are the main (full-frame) passes
    with stopped gradients; the student ("transformed-student") re-runs the model
    on a fixed border crop of the frames, and the teacher's flow — cropped into
    the student frame by losses.uflow.selfsup_crop_transforms — supervises it
    where forward-backward consistency says the teacher is reliable.

    Schedules (the reference recipe anneals both, `uflow_loss_pytorch.py:643+`
    / the UFlow paper's --selfsup_after_num_steps): occlusion masking activates
    at `occlusion_warmup_steps` (random early flows mark everything occluded),
    and the selfsup weight ramps 0 -> weights['selfsup'] linearly over
    `selfsup_ramp_steps` after that point — a teacher that hasn't bootstrapped
    yet only teaches the student its own noise. `weights={'selfsup': 0}` (or a
    weights dict without the key) statically skips the student passes entirely:
    the photometric-only ablation runs 2 model applies instead of 4.

    sequence_gamma: when > 0, the photometric + smoothness loss is applied to
    EVERY GRU iteration's flow with exponentially decaying weights
    gamma^(n-1-i) (normalized), the unsupervised analogue of supervised RAFT's
    sequence loss — the key SMURF recipe element (Stone et al. 2021, "SMURF:
    Self-Teaching Multi-Frame Unsupervised RAFT") for training RAFT without
    labels. With the loss only on the final flow (sequence_gamma=0, the
    round-2 recipe) the trainer measurably collapses to the zero-flow
    attractor: zero flow is fb-consistency-stable (nothing is marked occluded)
    and smooth2-optimal, and on the warped-pair data census-at-zero (3.22)
    equals the observed plateau while census-at-gt is 1.28. Supervising every
    refinement iteration gives the update operator a direct error signal
    before the recurrence can settle on the degenerate fixed point. Selfsup
    still applies to the final iteration only (the teacher worth imitating)."""
    from raft_optical_flow_tpu.losses import uflow
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig

    config = config or RAFTConfig(small=True)
    weights = weights or {
        "census": 1.0,
        "smooth2": 2.0,
        "edge_constant": 150.0,
        "selfsup": 0.3,
    }
    use_selfsup = float(weights.get("selfsup", 0.0)) != 0.0  # static
    model = RAFT(config)
    img1, img2 = batch["image1"], batch["image2"]  # 0-255 (RAFT convention)
    c = selfsup_crop
    assert c % 4 == 0, "selfsup_crop must divide the 3-level pyramid"
    img1_crop = img1[:, c:-c, c:-c]
    img2_crop = img2[:, c:-c, c:-c]
    transforms = uflow.selfsup_crop_transforms(c, c) if use_selfsup else None

    def pyramid(flow):
        """[full, /2, /4] resize pyramid (UFlow losses consume 3 levels)."""
        _, H, W, _ = flow.shape
        return [
            flow,
            uflow.resize(flow, H // 2, W // 2, is_flow=True),
            uflow.resize(flow, H // 4, W // 4, is_flow=True),
        ]

    def loss_fn(params):
        variables = {"params": params}

        def run_all(a, b):
            preds = model.apply(variables, a, b, iters=iters, train=True)
            # RAFT emits (dx, dy); losses/uflow.py follows UFlow's (dy, dx)
            # convention throughout (see its module docstring) — flip here.
            return [p[..., ::-1] for p in preds]

        fw_list, bw_list = run_all(img1, img2), run_all(img2, img1)
        images = {0: img1 / 255.0, 1: img2 / 255.0}
        # Occlusion warm-up (UFlow's occlusion_active schedule): with random
        # early flows the range-map/fb estimators mark ~everything occluded,
        # which zeroes the photometric term and lets smoothness collapse the
        # model. Treat all pixels as visible until the flows bootstrap.
        occ_on = (state.step >= occlusion_warmup_steps).astype(jnp.float32)
        # linear selfsup ramp once the occlusion masks are live: the teacher
        # must bootstrap before it is worth imitating
        ramp = jnp.clip(
            (state.step - occlusion_warmup_steps).astype(jnp.float32)
            / float(max(selfsup_ramp_steps, 1)),
            0.0, 1.0,
        )

        selfsup_flows = None
        if use_selfsup:
            # student on the cropped view (final-iteration flow)
            selfsup_flows = {
                (0, 1, "transformed-student"): pyramid(
                    run_all(img1_crop, img2_crop)[-1]),
                (1, 0, "transformed-student"): pyramid(
                    run_all(img2_crop, img1_crop)[-1]),
            }

        def iteration_losses(fw, bw, selfsup):
            """Full UFlow loss on one (fw, bw) iteration pair; `selfsup`
            (final iteration only) adds the student/teacher term."""
            flows = {}
            # photometric terms use these ("augmented-student")
            flows[(0, 1, "augmented-student")] = pyramid(fw)
            flows[(1, 0, "augmented-student")] = pyramid(bw)
            # teacher = the same flows with gradients stopped
            flows[(0, 1, "original-teacher")] = [
                jax.lax.stop_gradient(x) for x in flows[(0, 1, "augmented-student")]]
            flows[(1, 0, "original-teacher")] = [
                jax.lax.stop_gradient(x) for x in flows[(1, 0, "augmented-student")]]
            if selfsup is not None:
                flows.update(selfsup)
            warps, valid_masks, _, occ_masks, fb_sq_diff, fb_sum_sq = (
                uflow.compute_warps_and_occlusion(flows, occlusion_estimation)
            )
            occ_masks = jax.tree.map(
                lambda m: occ_on * m + (1.0 - occ_on) * jnp.ones_like(m), occ_masks
            )
            aug_warps = {
                k: v for k, v in warps.items() if k[2] == "augmented-student"}
            warped_images = uflow.apply_warps_stop_grad(images, aug_warps, level=0)
            step_weights = dict(weights)
            if selfsup is not None:
                step_weights["selfsup"] = weights["selfsup"] * ramp
            else:
                step_weights.pop("selfsup", None)
            return uflow.compute_loss(
                step_weights, images, flows, warps, valid_masks, occ_masks,
                fb_sq_diff, fb_sum_sq, warped_images,
                selfsup_transform_fns=transforms if selfsup is not None else None,
            )

        if sequence_gamma:
            # SMURF sequence loss: supervise every GRU iteration, decayed
            # toward the final one (see docstring — prevents the zero-flow
            # collapse the final-only loss measurably falls into)
            n = len(fw_list)
            ws = [sequence_gamma ** (n - 1 - i) for i in range(n)]
            total_w = sum(ws)
            total = 0.0
            for i, (fw_i, bw_i) in enumerate(zip(fw_list, bw_list)):
                it = iteration_losses(
                    fw_i, bw_i, selfsup_flows if i == n - 1 else None)
                # the selfsup term (final iteration only) is added OUTSIDE the
                # normalized sequence sum so weights['selfsup']*ramp is its
                # actual effective weight — folding it into the gamma-weighted
                # total would dilute it by ws[n-1]/total_w (~0.34 at
                # gamma=0.8, iters=4) relative to the sequence_gamma=0 path
                it_total = it["total"] - it.get("selfsup", 0.0)
                total = total + (ws[i] / total_w) * it_total
                if i == n - 1:
                    losses = dict(it)  # final-iteration terms for metrics
                    total = total + it.get("selfsup", 0.0)
            losses["total"] = total
        else:
            losses = iteration_losses(fw_list[-1], bw_list[-1], selfsup_flows)

        fw = fw_list[-1]
        metrics = {k: v for k, v in losses.items() if k != "total"}
        if "flow" in batch:  # EPE vs ground truth, monitoring only
            epe = jnp.sqrt(jnp.sum((fw[..., ::-1] - batch["flow"]) ** 2, -1))
            vmask = batch.get("valid", jnp.ones_like(epe))
            metrics["epe"] = jnp.sum(epe * vmask) / jnp.maximum(jnp.sum(vmask), 1.0)
        return losses["total"], metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


def ifnet_train_step(state, batch, *, unsupervised: bool = False):
    """IFNet step (`IFNET_train.py:256,288-293`): supervised picks
    flow[..., 2:4] as the prediction; unsupervised uses laploss on the cascade."""
    model = IFNet()
    img1 = batch["image1"] / 255.0
    img2 = batch["image2"] / 255.0

    def loss_fn(params):
        flow_list, mask_list, warped_list = model.apply(
            {"params": params}, img1, img2
        )
        if unsupervised:
            loss, metrics = laploss(warped_list, img1, img2)
        else:
            preds = [f[..., 2:4] for f in flow_list]
            loss, metrics = simple_flow_loss(preds, batch["flow"], batch["valid"], img1)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))


# ------------------------------------------------------------------ the trainer


class FlowTrainer:
    """Generic SPMD trainer: jitted step over a data mesh + logging + checkpoints.

    model_kind in {'lfn3', 'lfn3_unsup', 'simple_flow', 'simple_flow_unsup',
    'ifnet', 'ifnet_unsup'}.
    """

    STEP_FNS: Dict[str, Callable] = {
        "lfn3": lfn3_train_step,
        "lfn3_unsup": lfn3_unsup_train_step,
        "simple_flow": simple_flow_train_step,
        "simple_flow_unsup": simple_flow_unsup_train_step,
        "ifnet": lambda s, b, config=None: ifnet_train_step(s, b, unsupervised=False),
        "ifnet_unsup": lambda s, b, config=None: ifnet_train_step(s, b, unsupervised=True),
        "raft_uflow_unsup": lambda s, b, config=None, **kw: uflow_unsup_train_step(
            s, b, config=config, **kw
        ),
    }

    def __init__(
        self,
        model_kind: str,
        image_size: Tuple[int, int],
        model_config: Any = None,
        optim: Optional[OptimConfig] = None,
        mesh=None,
        seed: int = 1234,
        restore_variables: Optional[Dict] = None,
        checkpoint_dir: str = "checkpoints",
        step_kwargs: Optional[Dict[str, Any]] = None,
    ):
        if model_kind not in self.STEP_FNS:
            raise ValueError(f"unknown model_kind {model_kind!r}")
        self.model_kind = model_kind
        base = model_kind.replace("_unsup", "")
        if model_config is None:
            if base == "raft_uflow":
                from raft_optical_flow_tpu.models.raft import RAFTConfig

                model_config = RAFTConfig(small=True)
            else:
                model_config = {
                    "lfn3": LFN3Config(),
                    "simple_flow": SimpleFlowConfig(),
                    "ifnet": None,
                }[base]
        self.model_config = model_config
        self.optim = optim or OptimConfig(adamw=(base != "lfn3"))
        self.mesh = mesh if mesh is not None else make_mesh()
        self.checkpoint_dir = checkpoint_dir
        self.rng = jax.random.PRNGKey(seed)

        H, W = image_size
        dummy = jnp.zeros((1, H, W, 3), jnp.float32)
        if base == "lfn3":
            model = LiteFlowNet3(model_config)
            variables = model.init(self.rng, jnp.stack([dummy, dummy], 1), training=True)
        elif base == "simple_flow":
            model = SimpleFlowNet(model_config)
            variables = model.init(self.rng, dummy, dummy)
        elif base == "raft_uflow":
            from raft_optical_flow_tpu.models.raft import RAFT

            model = RAFT(model_config)
            variables = model.init(self.rng, dummy, dummy, iters=1, test_mode=True)
        else:
            model = IFNet()
            variables = model.init(self.rng, dummy, dummy)

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if restore_variables is not None:
            params = restore_variables.get("params", params)
            batch_stats = restore_variables.get("batch_stats", batch_stats)

        tx, self.schedule = make_step_optimizer(self.optim)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )
        self.logger = MetricLogger(schedule=self.schedule)

        step_fn = self.STEP_FNS[model_kind]
        cfg = self.model_config
        kw = step_kwargs or {}  # static per-kind knobs (e.g. uflow schedules)
        self._step = jax.jit(
            lambda state, batch: step_fn(state, batch, config=cfg, **kw),
            donate_argnums=(0,),
        )

    def train_step(self, batch):
        batch = shard_batch(batch, self.mesh)
        self.state, metrics = self._step(self.state, batch)
        return metrics

    @property
    def variables(self):
        return _variables(self.state)

    def run(self, data_iter, num_steps: int, val_fn=None, val_freq: int = 5000,
            resume: bool = False):
        """Main loop: periodic val + weights .npz + full-state orbax checkpoints
        (latest/best/periodic, optimizer included — the reference's richer trainer
        checkpoint policy, `train_liteflownet3.py:549-567`)."""
        from raft_optical_flow_tpu.parallel.distributed import (
            fetch_replicated,
            is_lead_host,
        )
        from raft_optical_flow_tpu.utils.checkpoint import (
            CheckpointManager,
            best_checkpoint_metric,
        )

        lead = is_lead_host()
        mgr = CheckpointManager(
            os.path.join(self.checkpoint_dir, f"{self.model_kind}_state"),
            keep_every=val_freq,
        )
        if resume:
            self.state, ok = mgr.restore_latest(self.state)
            if ok and lead:
                print(f"resumed from step {int(fetch_replicated(self.state.step))}")
        start = int(fetch_replicated(self.state.step))
        if hasattr(data_iter, "epochs"):
            from raft_optical_flow_tpu.data.pipeline import prefetch_to_device

            data_iter = prefetch_to_device(
                data_iter.epochs(skip_batches=start), mesh=self.mesh
            )
        for step in range(start, num_steps):
            # every process fetches (collective-free local-shard copy); only
            # the lead logs/writes — asymmetric jax fetches deadlock the pod
            metrics = fetch_replicated(self.train_step(next(data_iter)))
            if lead:
                self.logger.push(jax.tree.map(float, metrics))
            if (step + 1) % val_freq == 0:
                if lead:
                    self.save_checkpoint(f"{self.model_kind}_{step + 1}")
                metric = None
                if val_fn is not None:
                    results = val_fn(self.variables)
                    if lead:
                        self.logger.write_dict(results)
                    metric = best_checkpoint_metric(results)
                # orbax save is COLLECTIVE: every process participates, the
                # primary host writes (lead-gating it deadlocks the pod)
                mgr.save(self.state, step + 1, metric)
        if lead:
            self.save_checkpoint(self.model_kind)
        mgr.save(self.state, num_steps)
        return self.state

    def save_checkpoint(self, name: str):
        import os

        from raft_optical_flow_tpu.parallel.distributed import fetch_replicated
        from raft_optical_flow_tpu.utils.torch_convert import save_flax_checkpoint

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.checkpoint_dir, f"{name}.npz")
        save_flax_checkpoint(fetch_replicated(self.variables), path)
        return path
