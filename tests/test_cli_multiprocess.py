"""CLI-level multi-host SPMD tests (VERDICT round-2 item 1).

Launches the ACTUAL production CLI (`raft_optical_flow_tpu.cli.train_raft`) as
two coordinated processes on a virtual 4+4-device CPU mesh and checks it
against a single-process 8-device run — i.e. `distributed.initialize` + the
sharded FlowDataLoader + the global-batch assembly are wired into the
user-facing entry point, not just a test harness. This is the end-to-end
replacement for `/root/reference/train.py:172`'s DataParallel at a scale
(multi-process) the reference never had.

Tolerance design (measured, not guessed): after ONE step, 1-proc vs 2-proc
params differ only where the cross-host all-reduce's different summation order
perturbs a gradient by ~1 ulp and AdamW's m̂/√v̂ amplifies it — observed max
1e-5 over 0.003% of elements. Further steps amplify chaotically (by step 2 the
median diff is lr-scale), so cross-topology equality is only meaningful at
step 1 and is asserted statistically: a structural bug (wrong shard slicing,
wrong batch assembly) changes the gradient *everywhere* and trips the
fraction bound immediately. Resume correctness is asserted within the SAME
topology (2-proc resumed-to-4 vs 2-proc straight-4), where the reduction
order is identical and the comparison is tight.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMMON = [
    "--stage", "chairs", "--synthetic", "--small",
    "--batch_size", "8", "--image_size", "48", "64",
    "--iters", "2", "--lr", "4e-4", "--val_freq", "2",
    "--num_workers", "1",
    # this image force-registers the TPU backend over JAX_PLATFORMS=cpu
    "--platform", "cpu",
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _env(n_devices: int):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
    return env


def _launch(ckpt_dir, num_steps, num_procs, proc_id, port, extra=()):
    cmd = [
        sys.executable, "-m", "raft_optical_flow_tpu.cli.train_raft",
        *COMMON, "--num_steps", str(num_steps), "--checkpoint_dir", str(ckpt_dir),
        *extra,
    ]
    if num_procs > 1:
        cmd += [
            "--dist_coordinator", f"localhost:{port}",
            "--dist_num_processes", str(num_procs),
            "--dist_process_id", str(proc_id),
        ]
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=REPO, env=_env(8 // num_procs),
    )


def _wait(procs):
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, f"CLI failed:\n{stderr[-3000:]}\n{stdout[-500:]}"


def _run_cli(ckpt_dir, num_steps, num_procs, extra=()):
    port = _free_port()
    _wait([_launch(ckpt_dir, num_steps, num_procs, i, port, extra)
           for i in range(num_procs)])


def _params(ckpt_dir):
    path = os.path.join(str(ckpt_dir), "raft.npz")
    assert os.path.exists(path), f"final checkpoint missing in {ckpt_dir}"
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _flat_diff(a, b):
    assert set(a) == set(b)
    return np.concatenate([np.abs(a[k] - b[k]).ravel() for k in sorted(a)])


@pytest.fixture(scope="module")
def cli_runs(tmp_path_factory):
    """All CLI trainings for this module (grouped so pairs run concurrently)."""
    root = tmp_path_factory.mktemp("cli_mp")
    dirs = {
        "single1": root / "single1",   # 1 proc x 8 dev, 1 step
        "multi1": root / "multi1",     # 2 proc x 4 dev, 1 step
        "multi4": root / "multi4",     # 2 proc x 4 dev, 4 straight steps
        "multi2r": root / "multi2r",   # 2 proc x 4 dev, 2 steps then resume to 4
    }
    # the single-process run proceeds concurrently with the first 2-proc run
    s1 = _launch(dirs["single1"], 1, 1, 0, 0)
    _run_cli(dirs["multi1"], 1, 2)
    _wait([s1])
    _run_cli(dirs["multi4"], 4, 2)
    # 2 steps into multi2r (leaves an orbax 'latest' at step 2) ...
    _run_cli(dirs["multi2r"], 2, 2)
    # ... then resume the same directory across FRESH processes to step 4
    _run_cli(dirs["multi2r"], 4, 2, extra=("--resume",))
    return dirs


def test_cli_two_process_matches_single(cli_runs):
    """Topology equivalence after one step: only reduction-order noise allowed."""
    d = _flat_diff(_params(cli_runs["multi1"]), _params(cli_runs["single1"]))
    assert d.max() < 1e-3, f"max param diff {d.max():.2e}"
    assert (d > 1e-6).mean() < 0.01, (
        f"{(d > 1e-6).mean():.2%} of params differ — global batch assembly "
        "or gradient reduction is structurally wrong"
    )


def test_cli_resume_across_process_boundary(cli_runs):
    """2-proc run resumed from its step-2 orbax state must equal the straight
    4-step run of the same topology (same reduction order -> tight)."""
    a = _params(cli_runs["multi2r"])
    b = _params(cli_runs["multi4"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6, err_msg=k)
