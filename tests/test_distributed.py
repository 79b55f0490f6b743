"""Multi-host (DCN) smoke test for parallel.mesh.initialize_distributed
(SURVEY §5.8): two real OS processes form a jax.distributed cluster over a
localhost coordinator, build ONE global mesh spanning both processes'
(virtual CPU) devices, and run a sharded-batch gradient step whose psum
rides the cross-process collective path — the CPU analogue of the
ICI-within-slice / DCN-across-hosts layout."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2 "
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=60 "
    "--xla_cpu_collective_call_terminate_timeout_seconds=600"
)
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins the axon
                                           # plugin; env var alone won't do
from inbed_pose_estimation_tpu.parallel.mesh import (
    batch_sharding, initialize_distributed, make_mesh, replicated)

initialize_distributed(f"localhost:{port}", num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 2 * nproc, jax.device_count()
assert jax.local_device_count() == 2

import numpy as np
import jax.numpy as jnp

mesh = make_mesh()
assert len(mesh.devices.ravel()) == 2 * nproc  # mesh spans BOTH processes

B, D = 8, 4
xg = np.arange(B * D, dtype=np.float32).reshape(B, D) / (B * D)
wg = np.eye(D, dtype=np.float32)
x = jax.make_array_from_callback(
    (B, D), batch_sharding(mesh), lambda idx: xg[idx])
w = jax.make_array_from_callback((D, D), replicated(mesh), lambda idx: wg[idx])

@jax.jit
def step(w, x):
    def loss_fn(w):
        return jnp.mean((x @ w) ** 2)  # mean over the GLOBAL batch -> psum
    loss, g = jax.value_and_grad(loss_fn)(w)
    return loss, w - 0.1 * g

loss, w2 = step(w, x)
loss2, _ = step(w2, x)
print(f"DIST_OK pid={pid} loss={float(loss):.8f} loss2={float(loss2):.8f}",
      flush=True)
assert float(loss2) < float(loss)
"""


@pytest.mark.slow
def test_two_process_distributed_sharded_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["INBED_TESTS_NO_REEXEC"] = "1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"DIST_OK pid={pid}" in out, out[-3000:]

    # Both controllers computed the SAME global loss (the psum crossed
    # processes; a process seeing only its local shard would differ).
    import re

    losses = {re.search(r"loss=([0-9.]+)", o).group(1) for o in outs}
    assert len(losses) == 1, f"processes disagree on the global loss: {losses}"
