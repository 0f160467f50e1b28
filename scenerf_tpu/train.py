"""Training loop machinery: TrainState, the sharded jitted train/val steps, the
optimizer, and epoch orchestration.

Replaces the reference's pytorch-lightning Trainer + DDP
(ref scenerf/scripts/train_kitti.py:104-158) with:
  * one `jax.jit(shard_map(...))` train step over a 1-D `data` mesh -- forward,
    backward, gradient psum over ICI, and the AdamW update all fused into a
    single XLA program
  * AdamW + per-epoch exponential LR decay (ref scenerf.py:756-761)
  * sync-BN via BatchNorm axis_name, matching Trainer(sync_batchnorm=True)
  * Orbax checkpoints keeping `last` + `best(valdepth/abs_rel)`
    (ref train_kitti.py:110-140)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from scenerf_tpu.config import SceneRFConfig
from scenerf_tpu.model import SceneRF
from scenerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicate


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any            # {"net_rgb": ..., "mlp": ..., "mlp_gaussian": ...}
    batch_stats: Any       # net_rgb running BN stats
    opt_state: Any

    def variables(self) -> Dict[str, Any]:
        v = {k: {"params": self.params[k]} for k in self.params}
        v["net_rgb"]["batch_stats"] = self.batch_stats
        return v

    @staticmethod
    def from_variables(variables, opt_state, step=0):
        params = {k: variables[k]["params"] for k in variables}
        return TrainState(
            step=jnp.asarray(step, jnp.int32),
            params=params,
            batch_stats=variables["net_rgb"]["batch_stats"],
            opt_state=opt_state,
        )


def make_lr_schedule(cfg: SceneRFConfig, steps_per_epoch: int):
    return optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(1, steps_per_epoch),
        decay_rate=cfg.lr_decay_gamma,
        staircase=True,
    )


def make_optimizer(cfg: SceneRFConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW with gamma^epoch exponential decay (staircase per epoch),
    matching the reference's AdamW + ExponentialLR(0.95)."""
    return optax.adamw(make_lr_schedule(cfg, steps_per_epoch),
                       weight_decay=cfg.weight_decay)


class Trainer:
    """Builds the sharded train/val step functions for a config + mesh."""

    def __init__(
        self,
        cfg: SceneRFConfig,
        mesh: Optional[Mesh] = None,
        steps_per_epoch: int = 1000,
        with_depth_eval: bool = True,
        ray_parallel: bool = False,
        ray_shard: bool = False,
    ):
        """ray_parallel=True replicates the (small) batch across the mesh and
        gives every device an independent ray sample of the same items (the
        per-device RNG fold picks different pixels); gradient pmean then makes
        one step equivalent to n_devices x n_rays rays per item. Use when the
        global batch is smaller than the mesh (e.g. the published bs=4 config
        on a v5e-8).

        ray_shard=True also replicates the batch but splits each item's
        n_rays ACROSS the mesh (every device renders n_rays/n_devices of the
        same pixel set with shard-invariant noise; reprojection masked means
        psum num/den) -- one step is bit-identical to the unsharded published
        ray batch (up to f32 reduction order) at ~1/n the ray-side wall clock
        (SURVEY 2.2; exactness proven in tests/test_train.py)."""
        if ray_parallel and ray_shard:
            raise ValueError("ray_parallel and ray_shard are exclusive")
        self.cfg = cfg
        self.ray_parallel = ray_parallel
        self.ray_shard = ray_shard
        self.mesh = mesh if mesh is not None else make_mesh()
        self.model = SceneRF(cfg, axis_name=DATA_AXIS)
        self.lr_schedule = make_lr_schedule(cfg, steps_per_epoch)
        self.tx = make_optimizer(cfg, steps_per_epoch)
        self.with_depth_eval = with_depth_eval
        self._maps_cache: Dict[bytes, Any] = {}
        self._train_step = self._build_step(train=True)
        self._val_step = self._build_step(train=False)
        self._depth_eval_step = None  # built lazily on first depth_eval_step()
        self._train_val_step = None   # built lazily on first train_step_with_val()

    # ------------------------------------------------------------------ state
    def create_state(self, key: jax.Array) -> TrainState:
        # Initialize on host CPU: eager per-op dispatch of a deep encoder to a
        # (possibly remote) accelerator is pathologically slow, and the init
        # graph is not worth an XLA compile. One device_put ships the tree.
        # local_devices, not devices: under multi-process the global device
        # list starts with process 0's devices, which other processes cannot
        # create arrays on
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = self.model.init(key)
            params = {k: variables[k]["params"] for k in variables}
            opt_state = self.tx.init(params)
            state = TrainState.from_variables(variables, opt_state)
        # replicate() (not device_put) so multi-process runs skip the
        # 30s-deadline Gloo consistency check (see parallel.mesh.replicate)
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------ steps
    def _make_per_shard(self, train: bool, with_losses: bool = True,
                        with_depth_eval: Optional[bool] = None):
        """The pure per-device step body: (state, batch, key, sphere_maps) ->
        (state, metrics). Shared by the standalone steps (_build_step) and the
        fused train+val program (_build_step_with_val)."""
        model, tx, cfg = self.model, self.tx, self.cfg
        if with_depth_eval is None:
            with_depth_eval = self.with_depth_eval

        n_dev = self.mesh.shape[DATA_AXIS]
        ray_shard_n = n_dev if (self.ray_shard and n_dev > 1) else 1
        if ray_shard_n > 1 and cfg.n_rays % ray_shard_n:
            raise ValueError(f"n_rays={cfg.n_rays} must be a multiple of the "
                             f"mesh size {ray_shard_n} for ray_shard")
        if ray_shard_n > 1 and with_depth_eval and cfg.n_gt_depth % ray_shard_n:
            raise ValueError(
                f"n_gt_depth={cfg.n_gt_depth} must be a multiple of the mesh "
                f"size {ray_shard_n} for ray_shard with depth eval (the GT "
                f"rows are sharded across the mesh like the train rays)")

        def per_shard(state: TrainState, batch, key, sphere_maps):
            # fold in step + device INSIDE the program: host-side fold_in is a
            # separate (expensive) dispatch through the runtime per step
            key = jax.random.fold_in(key, state.step)
            if ray_shard_n == 1:
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            else:
                # ray_shard: SAME key on every device (same pixel sample; the
                # model row-slices per device with shard-invariant noise).
                # fold_in(key, 0) matches the 1-device data path's derivation
                # exactly, so the sharded step is bit-comparable to it.
                key = jax.random.fold_in(key, 0)

            def loss_fn(params):
                variables = {k: {"params": params[k]} for k in params}
                variables["net_rgb"]["batch_stats"] = state.batch_stats
                loss, metrics, new_vars = model.forward(
                    variables, batch, key, train=train,
                    with_depth_eval=with_depth_eval, sphere_maps=sphere_maps,
                    ray_shard_n=ray_shard_n, with_losses=with_losses,
                )
                return loss, (metrics, new_vars["net_rgb"].get("batch_stats"))

            if train:
                (loss, (metrics, new_stats)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                grads = jax.lax.pmean(grads, DATA_AXIS)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                # BN stats are already identical across devices (axis_name sync)
                state = state.replace(
                    step=state.step + 1, params=params,
                    batch_stats=new_stats, opt_state=opt_state,
                )
            else:
                loss, (metrics, _) = loss_fn(state.params)
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
            return state, metrics

        return per_shard

    def _batch_spec(self):
        return P() if (self.ray_parallel or self.ray_shard) else P(DATA_AXIS)

    def _build_step(self, train: bool, with_losses: bool = True,
                    with_depth_eval: Optional[bool] = None):
        per_shard = self._make_per_shard(train, with_losses, with_depth_eval)
        fn = shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(), self._batch_spec(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,) if train else ())

    def _build_step_with_val(self):
        """ONE program: the train step plus a lax.cond-gated GT-depth eval on a
        separate val batch. XLA reuses a program's temp buffers across its ops,
        so peak HBM stays at the train step's own peak -- whereas a separately
        loaded depth-eval executable statically reserves its own temps on TPU
        and cannot co-reside with the 8-source train program (the round-4/5
        quality-arm OOM). The val half reads the POST-update params, i.e.
        metrics are "val after step N", matching the old two-program protocol.
        """
        from scenerf_tpu import losses as L

        train_ps = self._make_per_shard(train=True)
        val_ps = self._make_per_shard(train=False, with_losses=False,
                                      with_depth_eval=True)
        val_keys = tuple(f"depth/{k}" for k in L.DEPTH_METRIC_NAMES) \
            + ("total_loss",)

        def per_shard(state, batch, key, val_batch, val_key, do_val,
                      sphere_maps):
            state, metrics = train_ps(state, batch, key, sphere_maps)

            def run(_):
                _, vm = val_ps(state, val_batch, val_key, sphere_maps)
                return {k: vm[k] for k in val_keys}

            def skip(_):
                return {k: jnp.zeros(()) for k in val_keys}

            val_metrics = jax.lax.cond(do_val, run, skip, None)
            return state, metrics, val_metrics

        bs = self._batch_spec()
        fn = shard_map(
            per_shard,
            mesh=self.mesh,
            in_specs=(P(), bs, P(), bs, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(fn, donate_argnums=(0,))

    # ------------------------------------------------------------- step APIs
    def _sphere_maps_for(self, batch) -> Dict[int, Any]:
        """Host-cached sphere scatter maps keyed by the batch's intrinsics."""
        cam_K = np.asarray(jax.device_get(batch["cam_K"]))[0]
        key = cam_K.tobytes()
        maps = self._maps_cache.get(key)
        if maps is None:
            maps = self.model.compute_sphere_maps(cam_K)
            maps = replicate(maps, self.mesh)
            self._maps_cache[key] = maps
        return maps

    def train_step(self, state: TrainState, batch, key,
                   sphere_maps=None) -> Tuple[TrainState, Dict]:
        if sphere_maps is None:
            sphere_maps = self._sphere_maps_for(batch)
        return self._train_step(state, batch, key, sphere_maps)

    def val_step(self, state: TrainState, batch, key, sphere_maps=None) -> Dict:
        if sphere_maps is None:
            sphere_maps = self._sphere_maps_for(batch)
        _, metrics = self._val_step(state, batch, key, sphere_maps)
        return metrics

    def depth_eval_step(self, state: TrainState, batch, key,
                        sphere_maps=None) -> Dict:
        """GT-depth metrics only (no loss renders, no grads): a program ~100x
        smaller than val_step, so it co-fits in HBM beside even the 8-source
        train program (the round-4 quality runs OOMed keeping the full val
        program resident). Depth metrics are bit-identical to val_step's
        (same key derivation; tested in tests/test_train.py). Built lazily so
        Trainers that never eval (bench, dryrun) pay no extra compile."""
        if self._depth_eval_step is None:
            self._depth_eval_step = self._build_step(
                train=False, with_losses=False, with_depth_eval=True)
        if sphere_maps is None:
            sphere_maps = self._sphere_maps_for(batch)
        _, metrics = self._depth_eval_step(state, batch, key, sphere_maps)
        return metrics

    def train_step_with_val(self, state: TrainState, batch, key, val_batch,
                            val_key, do_val,
                            sphere_maps=None) -> Tuple[TrainState, Dict, Dict]:
        """Fused train + conditional val-depth-eval step (one resident TPU
        program -- see _build_step_with_val). `do_val` is a traced bool: when
        False the val render is skipped at runtime (lax.cond) and the val
        metrics come back as zeros. val_batch may stack several val items
        (B_val > 1 runs under the model's constant-memory lax.map) but must
        share the train batch's intrinsics (sphere maps are keyed on cam_K);
        its img_sources/img_targets are never read (no loss render), so
        callers can pass [B, S, 1, 1, 3] zero stubs to keep HBM flat.

        Returns (new_state, train_metrics, val_metrics)."""
        if self._train_val_step is None:
            self._train_val_step = self._build_step_with_val()
        if sphere_maps is None:
            sphere_maps = self._sphere_maps_for(batch)
        return self._train_val_step(state, batch, key, val_batch, val_key,
                                    jnp.asarray(do_val), sphere_maps)
