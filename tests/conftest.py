"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends, so this executes at conftest
import time (pytest imports conftest before any test module).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + parity: keep fp32 matmuls exact on CPU.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

# The image's sitecustomize force-registers the TPU backend ignoring JAX_PLATFORMS;
# the config update below is what actually pins tests to CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
