"""RAFT trainer: train state, optax AdamW + OneCycle, SPMD data-parallel train step.

Parity targets:
  - `train.py:113-120` — AdamW(lr, wdecay, eps) + OneCycleLR(pct_start=.05, linear,
    num_steps+100).
  - `train.py:170-267` — grad clip 1.0, optional gaussian input noise U(0,5)*N(0,1)
    clamped to [0,255], freeze_bn on every stage except chairs, periodic
    checkpoint/validate, sequence loss with per-stage gamma.
  - `train.py:123-167` — running-mean console logger every 100 steps.

TPU-native: one jitted train step; the batch is sharded over the mesh 'data' axis and
parameters are replicated, so XLA inserts the gradient all-reduce over ICI — the SPMD
replacement for `nn.DataParallel` (`train.py:172`).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from raft_optical_flow_tpu.losses.sequence import sequence_loss
from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig
from raft_optical_flow_tpu.parallel.mesh import make_mesh, shard_batch
from raft_optical_flow_tpu.train.configs import StageConfig


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
        )


def make_optimizer(
    lr: float, wdecay: float, epsilon: float, num_steps: int, clip: float = 1.0
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + linear OneCycle + global-norm clip (`train.py:113-120`)."""
    schedule = optax.linear_onecycle_schedule(
        transition_steps=num_steps + 100,
        peak_value=lr,
        pct_start=0.05,
        pct_final=1.0,
        div_factor=25.0,
        final_div_factor=1e4,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon, weight_decay=wdecay),
    )
    return tx, schedule


def create_train_state(
    rng: jax.Array,
    config: RAFTConfig,
    stage: StageConfig,
    image_size: Tuple[int, int],
    restore_variables: Optional[Dict] = None,
) -> TrainState:
    model = RAFT(config)
    H, W = image_size
    dummy = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": rng}, dummy, dummy, iters=2, test_mode=True
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if restore_variables is not None:
        # strict=False semantics (`train.py:175-176`): take what matches
        params = _merge_matching(params, restore_variables.get("params", {}))
        batch_stats = _merge_matching(batch_stats, restore_variables.get("batch_stats", {}))
    tx, _ = make_optimizer(stage.lr, stage.wdecay, stage.epsilon, stage.num_steps, stage.clip)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def _merge_matching(base, incoming):
    """Copy leaves from incoming into base where path + shape match (strict=False)."""
    if not isinstance(base, dict):
        return incoming if jnp.shape(base) == jnp.shape(incoming) else base
    out = {}
    for k, v in base.items():
        if isinstance(incoming, dict) and k in incoming:
            out[k] = _merge_matching(v, incoming[k])
        else:
            out[k] = v
    return out


def raft_train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    *,
    config: RAFTConfig,
    iters: int = 12,
    gamma: float = 0.8,
    add_noise: bool = False,
    freeze_bn: bool = True,
):
    """One SPMD train step. batch: image1/image2 [N,H,W,3] 0-255, flow [N,H,W,2], valid [N,H,W]."""
    model = RAFT(config)
    image1, image2 = batch["image1"], batch["image2"]

    if add_noise:
        k1, k2, k3 = jax.random.split(rng, 3)
        stdv = jax.random.uniform(k1, (), minval=0.0, maxval=5.0)
        image1 = jnp.clip(image1 + stdv * jax.random.normal(k2, image1.shape), 0.0, 255.0)
        image2 = jnp.clip(image2 + stdv * jax.random.normal(k3, image2.shape), 0.0, 255.0)

    update_bn = not freeze_bn and bool(state.batch_stats)

    def loss_fn(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        kwargs = dict(iters=iters, train=True, freeze_bn=freeze_bn)
        if update_bn:
            preds, mut = model.apply(
                variables, image1, image2, rngs={"dropout": rng},
                mutable=["batch_stats"], **kwargs,
            )
            new_bs = mut["batch_stats"]
        else:
            preds = model.apply(variables, image1, image2, rngs={"dropout": rng}, **kwargs)
            new_bs = state.batch_stats
        loss, metrics = sequence_loss(preds, batch["flow"], batch["valid"], gamma=gamma)
        return loss, (metrics, new_bs)

    (loss, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
    metrics = dict(metrics, loss=loss, grad_norm=optax.global_norm(grads))
    return new_state, metrics


class MetricLogger:
    """Running-mean console logger, printing every `freq` steps (`train.py:123-167`)."""

    def __init__(self, freq: int = 100, schedule=None, writer=None):
        self.freq = freq
        self.schedule = schedule
        self.writer = writer  # optional tensorboardX-like object
        self.total_steps = 0
        self.running: Dict[str, float] = {}
        self._t0 = time.time()

    def push(self, metrics: Dict[str, float]):
        self.total_steps += 1
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        if self.total_steps % self.freq == self.freq - 1:
            means = {k: v / self.freq for k, v in sorted(self.running.items())}
            lr = float(self.schedule(self.total_steps)) if self.schedule else float("nan")
            dt = time.time() - self._t0
            rate = self.freq / dt if dt > 0 else 0.0
            print(
                f"[{self.total_steps + 1:6d}, {lr:10.7f}] "
                + ", ".join(f"{k}={v:.4f}" for k, v in means.items())
                + f"  ({rate:.2f} it/s)"
            )
            if self.writer is not None:
                for k, v in means.items():
                    self.writer.add_scalar(k, v, self.total_steps)
            self.running = {}
            self._t0 = time.time()

    def write_dict(self, results: Dict[str, float]):
        if self.writer is not None:
            for k, v in results.items():
                self.writer.add_scalar(k, v, self.total_steps)


class RAFTTrainer:
    """End-to-end trainer: mesh setup, jitted SPMD step, logging, checkpoints."""

    def __init__(
        self,
        stage: StageConfig,
        config: Optional[RAFTConfig] = None,
        mesh=None,
        restore_variables: Optional[Dict] = None,
        checkpoint_dir: str = "checkpoints",
    ):
        self.stage = stage
        self.config = config or RAFTConfig(
            small=stage.small,
            compute_dtype=jnp.bfloat16 if stage.mixed_precision else jnp.float32,
        )
        self.mesh = mesh if mesh is not None else make_mesh()
        self.checkpoint_dir = checkpoint_dir
        rng = jax.random.PRNGKey(stage.seed)
        self.rng, init_rng = jax.random.split(rng)
        self.state = create_train_state(
            init_rng, self.config, stage, stage.image_size, restore_variables
        )
        _, self.schedule = make_optimizer(
            stage.lr, stage.wdecay, stage.epsilon, stage.num_steps, stage.clip
        )
        self.logger = MetricLogger(schedule=self.schedule)

        cfg, st = self.config, self.stage
        self._step = jax.jit(
            lambda state, batch, rng: raft_train_step(
                state, batch, rng,
                config=cfg, iters=st.iters, gamma=st.gamma,
                add_noise=st.add_noise, freeze_bn=st.freeze_bn,
            ),
            donate_argnums=(0,),
        )

    def train_step(self, batch: Dict[str, jnp.ndarray]):
        self.rng, step_rng = jax.random.split(self.rng)
        batch = shard_batch(batch, self.mesh)
        self.state, metrics = self._step(self.state, batch, step_rng)
        return metrics

    def run(self, data_iter, num_steps: Optional[int] = None, val_fn=None,
            resume: bool = False):
        """Main loop: `train.py:195-265` semantics (log/100, val+ckpt/val_freq),
        plus full-state orbax latest/best/periodic checkpoints for resume.

        data_iter may be a FlowDataLoader (resume then fast-forwards its
        deterministic sample stream to the restored step) or a plain batch
        iterator (resume re-reads it from its current position).
        """
        from raft_optical_flow_tpu.parallel.distributed import (
            fetch_replicated,
            is_lead_host,
        )
        from raft_optical_flow_tpu.utils.checkpoint import (
            CheckpointManager,
            best_checkpoint_metric,
        )

        num_steps = num_steps or self.stage.num_steps
        lead = is_lead_host()
        mgr = CheckpointManager(
            os.path.join(self.checkpoint_dir, f"{self.stage.name}_state"),
            keep_every=self.stage.val_freq,
        )
        if resume:
            self.state, ok = mgr.restore_latest(self.state)
            if ok and lead:
                print(f"resumed from step {int(fetch_replicated(self.state.step))}")
        start = int(fetch_replicated(self.state.step))
        if hasattr(data_iter, "epochs"):
            from raft_optical_flow_tpu.data.pipeline import prefetch_to_device

            data_iter = prefetch_to_device(
                data_iter.epochs(skip_batches=start), mesh=self.mesh,
            )
        for step in range(start, num_steps):
            batch = next(data_iter)
            # every process fetches (collective-free local-shard copy); only
            # the lead logs/writes — asymmetric jax fetches deadlock the pod
            metrics = fetch_replicated(self.train_step(batch))
            if lead:
                self.logger.push(jax.tree.map(float, metrics))
            if (step + 1) % self.stage.val_freq == 0:
                if lead:
                    self.save_checkpoint(f"{self.stage.name}_{step + 1}")
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
            self.save_checkpoint(self.stage.name)
        mgr.save(self.state, num_steps)
        return self.state

    @property
    def variables(self):
        v = {"params": self.state.params}
        if self.state.batch_stats:
            v["batch_stats"] = self.state.batch_stats
        return v

    def save_checkpoint(self, name: str):
        import os

        from raft_optical_flow_tpu.parallel.distributed import fetch_replicated
        from raft_optical_flow_tpu.utils.torch_convert import save_flax_checkpoint

        os.makedirs(self.checkpoint_dir, exist_ok=True)
        path = os.path.join(self.checkpoint_dir, f"{name}.npz")
        save_flax_checkpoint(fetch_replicated(self.variables), path)
        return path
