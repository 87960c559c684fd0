"""Multi-host SPMD test: 2 processes x 4 CPU devices == 1 process x 8 devices.

Validates the whole multi-host path end-to-end (parallel/distributed.py,
FlowDataLoader per-host sharding, make_array_from_process_local_data assembly in
shard_batch): one RAFT train step on the 8-device global mesh produces the same
loss / metrics / updated parameters whether the 8 devices live in one process or
are split across two coordinated processes. Scale the reference never had
(`train.py:172` is single-process DataParallel).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the worker sets its own device count / platform; drop the conftest's
    env.pop("XLA_FLAGS", None)
    return env


def _run(num_procs: int, proc_id: int, port: int):
    return subprocess.Popen(
        [sys.executable, WORKER, str(num_procs), str(proc_id), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=_clean_env(), cwd=os.path.dirname(os.path.dirname(WORKER)),
    )


def _metrics(stdout: str):
    for line in stdout.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in output:\n{stdout}")


def test_two_process_step_matches_single_process():
    port = _free_port()
    single = _run(1, 0, _free_port())
    workers = [_run(2, i, port) for i in range(2)]

    outs = []
    for p in [single] + workers:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(_metrics(stdout))

    ref, w0, w1 = outs
    assert w0 == w1, "the two processes disagree on replicated metrics"
    for key in ref:
        assert w0[key] == pytest.approx(ref[key], rel=1e-5, abs=1e-6), (
            f"{key}: single={ref[key]} multi={w0[key]}"
        )
