"""One JAX process of a real 2-process CPU cluster (tests/test_multihost.py).

Asserts the multi-host input path end to end: every process feeds only its
DataLoader slice of each global batch, and `parallel.mesh.shard_batch`
(-> jax.make_array_from_process_local_data) assembles exactly the global
batch a single-process loader would produce (SURVEY 2.2; the reference's
analog is Lightning's per-rank DataLoader under DDP).

Run by the test as: python _multihost_worker.py <port> <process_id> <nproc>
"""
from __future__ import annotations

import sys

import numpy as np


class Dataset:
    """Deterministic items so every process can compute the expected global
    batch locally (item i = constant array of value i)."""

    def __len__(self):
        return 13

    def __getitem__(self, i):
        return {
            "x": np.full((3, 2), i, np.float32),
            "idx": np.array([i], np.int32),
        }


def collate(items):
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax
    # sitecustomize preloads the axon TPU platform; force CPU before the
    # first backend query (env vars alone are too late, see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    from scenerf_tpu.data.loader import DataLoader
    from scenerf_tpu.parallel.mesh import make_mesh, shard_batch

    global_bs = 4
    mesh = make_mesh(jax.devices())  # all processes' devices, 1-D data mesh
    loader = DataLoader(Dataset(), collate, batch_size=global_bs,
                        shuffle=True, seed=7,
                        process_index=pid, process_count=nproc)
    # the single-process view of the same epoch (same seed => same order)
    want_loader = DataLoader(Dataset(), collate, batch_size=global_bs,
                             shuffle=True, seed=7)
    assert len(loader) == len(want_loader) == 13 // global_bs

    n_batches = 0
    for local, want in zip(loader, want_loader):
        assert local["x"].shape[0] == global_bs // nproc, local["x"].shape
        g = shard_batch(local, mesh)  # routes to shard_batch_multihost
        for k in ("x", "idx"):
            assert g[k].shape == want[k].shape, (g[k].shape, want[k].shape)
            # every addressable shard must hold exactly the corresponding
            # rows of the single-process global batch
            for shard in g[k].addressable_shards:
                np.testing.assert_array_equal(
                    np.asarray(shard.data), want[k][shard.index])
        # and the global array is usable in a jitted cross-host reduction
        total = jax.jit(lambda a: a.sum())(g["idx"])
        assert int(total) == int(want["idx"].sum()), (total, want["idx"].sum())
        n_batches += 1
    assert n_batches == len(want_loader)
    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
