"""Model export: StableHLO serialization (the TPU-native analog of ONNX export).

Parity target: the reference exports LiteFlowNet3 to ONNX for deployment
(`liteflownet3_simple.py:1186-1235`, `ONNX_EXPORT_README.md`). The JAX-native
equivalent is `jax.export`: a serialized StableHLO artifact with the same
cross-version / cross-runtime deployment role, loadable via `jax.export` or any
StableHLO consumer (e.g. IREE, TF SavedModel bridges).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def export_stablehlo(fn: Callable, example_args: Sequence, path: str) -> str:
    """Serialize `jit(fn)` at the example argument shapes to a StableHLO artifact."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_stablehlo(path: str):
    """Deserialize an exported function; returns a callable `.call`."""
    from jax import export as jexport

    with open(path, "rb") as f:
        blob = f.read()
    return jexport.deserialize(blob)


def export_raft(variables, path: str, *, small=False, iters=20, height=440,
                width=1024) -> str:
    """Export a RAFT test-mode forward at fixed shapes."""
    from raft_optical_flow_tpu.models.raft import RAFT, RAFTConfig

    model = RAFT(RAFTConfig(small=small))

    def fwd(image1, image2):
        return model.apply(variables, image1, image2, iters=iters, test_mode=True)[1]

    ex = (
        jnp.zeros((1, height, width, 3), jnp.float32),
        jnp.zeros((1, height, width, 3), jnp.float32),
    )
    return export_stablehlo(fwd, ex, path)


def export_lfn3(variables, path: str, *, use_s_version=False,
                use_pseudo_regularization=False, height=384, width=1024) -> str:
    """Export a LiteFlowNet3 forward at fixed shapes (ONNX-export parity role)."""
    from raft_optical_flow_tpu.models.liteflownet3 import LFN3Config, LiteFlowNet3

    model = LiteFlowNet3(LFN3Config(
        use_s_version=use_s_version,
        use_pseudo_regularization=use_pseudo_regularization,
    ))

    def fwd(images):
        out = model.apply(variables, images)
        return out["flows"], out["confs"]

    ex = (jnp.zeros((1, 2, height, width, 3), jnp.float32),)
    return export_stablehlo(fwd, ex, path)
