"""One JAX process of a real 2-process CPU cluster (tests/test_multihost.py).

Asserts the multi-host input path end to end: every process feeds only its
DataLoader slice of each global batch, and `parallel.mesh.shard_batch`
(-> jax.make_array_from_process_local_data) assembles exactly the global
batch a single-process loader would produce (SURVEY 2.2; the reference's
analog is Lightning's per-rank DataLoader under DDP).

Run by the test as:
    python _multihost_worker.py <port> <process_id> <nproc> [mode]
mode "input" (default) asserts the sliced-loader data path; mode "rayshard"
runs a real ray_shard train step over the cross-process mesh (replicated
batch assembled by parallel.mesh.replicate from per-process copies).
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


def run_rayshard(pid, nproc):
    """One ray_shard train step across the 2-process mesh: every process
    holds the same tiny batch (unsliced loaders in cli/train), replicate()
    assembles the replicated global array, and the jit(shard_map) step
    row-slices rays by global axis_index -- the cross-host half of the
    sharding story (tests/test_train.py proves the math single-process)."""
    import jax

    from scenerf_tpu import config as C
    from scenerf_tpu.data.synthetic import make_batch
    from scenerf_tpu.parallel.mesh import make_mesh, replicate
    from scenerf_tpu.train import Trainer
    from scenerf_tpu.utils.jax_setup import setup_compilation_cache

    setup_compilation_cache()  # shared cache: the second process loads, not
    # recompiles, the program the first one compiled
    cfg = C.tiny().replace(remat_chunks=False, remat_encoder=False)
    mesh = make_mesh(jax.devices())  # 4 devices across 2 processes
    assert cfg.n_rays % mesh.devices.size == 0
    trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=10,
                      with_depth_eval=False, ray_shard=True)
    state = trainer.create_state(jax.random.PRNGKey(0))
    batch = replicate(make_batch(cfg, batch_size=1), mesh)
    key = jax.random.PRNGKey(1)
    maps = trainer._sphere_maps_for(batch)

    # AOT-compile, then handshake through the coordination-service KV store
    # before the first collective execution: Gloo context init has a hard
    # 30 s deadline, and two single-core processes compiling concurrently
    # skew past it (first execution would time out while the peer is still
    # compiling). The KV handshake takes an explicit long timeout instead.
    compiled = trainer._train_step.lower(state, batch, key, maps).compile()
    from jax._src import distributed
    client = distributed.global_state.client
    client.key_value_set(f"rayshard_compiled/{pid}", "1")
    for other in range(nproc):
        client.blocking_key_value_get(f"rayshard_compiled/{other}", 600_000)

    state, metrics = compiled(state, batch, key, maps)
    loss = float(np.asarray(jax.device_get(metrics["total_loss"])))
    assert np.isfinite(loss), loss
    assert int(np.asarray(jax.device_get(state.step))) == 1
    # every process must see the identical psum'd loss
    print(f"RAYSHARD_LOSS {loss:.6f}", flush=True)
    print(f"MULTIHOST_OK {pid}", flush=True)


def main():
    port, pid, nproc = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "input"

    import jax
    # sitecustomize preloads the axon TPU platform; force CPU before the
    # first backend query (env vars alone are too late, see CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()

    if mode == "rayshard":
        run_rayshard(pid, nproc)
        return

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
