"""The unified SceneRF model: spherical U-Net image encoder + two conditioned
ResnetFC heads + the fused ray renderer, with the full self-supervised loss
stack.

This single parameterized implementation covers both reference stacks
(ref scenerf/models/scenerf.py and scenerf_bf.py, which share ~90% by
copy-paste; unified per SURVEY.md section 2.9) -- presets select the deltas.

Batch contract (per device, all fixed-shape, ragged structure padded+masked):
  img_input       [B, H, W, 3]   normalized input frames
  cam_K           [B, 3, 3]
  T_source2infer  [B, S, 4, 4]
  T_source2target [B, S, 4, 4]
  img_sources     [B, S, H, W, 3]
  img_targets     [B, S, H, W, 3]
  source_mask     [B, S]         1 for real sources, 0 for padding
  gt_pix          [B, S, G, 2]   depth-GT pixel locations (for val metrics)
  gt_depth        [B, S, G]
  gt_mask         [B, S, G]
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from scenerf_tpu import geometry as geo
from scenerf_tpu import losses as L
from scenerf_tpu import rendering as R
from scenerf_tpu import sampling as S
from scenerf_tpu.config import SceneRFConfig
from scenerf_tpu.encoder.sphere_decoder import decoder_latent_dim
from scenerf_tpu.encoder.unet_sphere import UNet2DSphere
from scenerf_tpu.fields import ResnetFC


class SceneRF:
    """Bundles the three networks and exposes pure apply functions.

    Parameters live in one variables dict:
      {"net_rgb": {"params", "batch_stats"}, "mlp": {"params"},
       "mlp_gaussian": {"params"}}
    """

    def __init__(self, cfg: SceneRFConfig, axis_name: Optional[str] = None):
        if cfg.n_rays > cfg.ray_chunk and cfg.n_rays % cfg.ray_chunk != 0:
            raise ValueError(
                f"n_rays={cfg.n_rays} must be a multiple of ray_chunk="
                f"{cfg.ray_chunk} (or fit in one chunk)")
        if (cfg.n_gt_depth > cfg.eval_ray_chunk
                and cfg.n_gt_depth % cfg.eval_ray_chunk != 0):
            raise ValueError(
                f"n_gt_depth={cfg.n_gt_depth} must be a multiple of "
                f"eval_ray_chunk={cfg.eval_ray_chunk} (or fit in one chunk)")
        self.cfg = cfg
        self.axis_name = axis_name
        self.net_rgb = UNet2DSphere(
            backbone_name=cfg.encoder,
            num_features=cfg.encoder_features,
            sphere=cfg.sphere,
            dtype=cfg.dtype,
            axis_name=axis_name,
            remat=cfg.remat_encoder,
            remat_decoder=cfg.remat_decoder,
            conv_impl=cfg.decoder_conv,
            gather_impl=cfg.resample_gather,
        )
        self.d_latent = decoder_latent_dim(cfg.encoder_features)
        self.mlp = ResnetFC(d_out=4, n_blocks=cfg.n_blocks, d_hidden=cfg.d_hidden,
                            dtype=cfg.dtype)
        self.mlp_gaussian = ResnetFC(d_out=2, n_blocks=cfg.n_blocks,
                                     d_hidden=cfg.d_hidden, dtype=cfg.dtype)

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Dict[str, Any]:
        cfg = self.cfg
        W, H = cfg.img_size
        k1, k2, k3 = jax.random.split(key, 3)
        img = jnp.zeros((1, H, W, 3), cfg.dtype)
        pix = geo.pixel_grid(W, H)
        pix_sphere = jnp.zeros_like(pix)
        net_rgb_vars = self.net_rgb.init(k1, img, pix, pix_sphere, train=False)
        z = jnp.zeros((1, self.d_latent))
        x = jnp.zeros((1, cfg.d_in))
        return {
            "net_rgb": dict(net_rgb_vars),
            "mlp": dict(self.mlp.init(k2, z, x)),
            "mlp_gaussian": dict(self.mlp_gaussian.init(k3, z, x)),
        }

    # ---------------------------------------------------------------- encode
    def compute_sphere_maps(self, cam_K) -> Dict[int, jnp.ndarray]:
        """Sphere scatter maps for a camera (host-side, once per intrinsics):
        the in-graph scatter is otherwise the largest single op of the train
        step (~21 ms/step on v5e)."""
        from scenerf_tpu.encoder.sphere_decoder import build_sphere_maps

        cpu = jax.local_devices(backend="cpu")[0]  # process-local (multi-host)
        with jax.default_device(cpu):
            inv_K = jnp.linalg.inv(jnp.asarray(cam_K))
            pix, pix_sphere, _ = geo.sphere_coords_from_pixels(
                inv_K, self.cfg.sphere, img_size=self.cfg.img_size)
            maps = build_sphere_maps(pix, pix_sphere, self.cfg.sphere)
        return {k: jax.device_get(v) for k, v in maps.items()}

    def encode(
        self,
        variables: Dict[str, Any],
        img: jnp.ndarray,     # [B, H, W, 3]
        cam_K: jnp.ndarray,   # [3, 3] (shared across the batch, as in the ref)
        train: bool = False,
        sphere_maps: Optional[Dict[int, jnp.ndarray]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Run the spherical U-Net; returns (levels dict [B, H_s, W_s, C],
        updated net_rgb variables). Pass precomputed `sphere_maps` on hot paths
        (see compute_sphere_maps)."""
        cfg = self.cfg
        inv_K = jnp.linalg.inv(cam_K)
        pix, pix_sphere, _ = geo.sphere_coords_from_pixels(
            inv_K, cfg.sphere, img_size=cfg.img_size
        )
        v = variables["net_rgb"]
        if train:
            levels, updates = self.net_rgb.apply(
                v, img.astype(cfg.dtype), pix, pix_sphere, train=True,
                maps=sphere_maps, mutable=["batch_stats"],
            )
            new_v = {**v, **updates}
        else:
            levels = self.net_rgb.apply(v, img.astype(cfg.dtype), pix, pix_sphere,
                                        train=False, maps=sphere_maps)
            new_v = v
        return levels, new_v

    @staticmethod
    def pyramid_for_item(levels: Dict[str, jnp.ndarray], b: int) -> R.FeaturePyramid:
        """Select one batch item's levels as a FeaturePyramid (scale order
        1, 2, 4, 8, 16 matching rendering.SCALES)."""
        return R.FeaturePyramid(levels=tuple(
            levels[k][b] for k in ("1_1", "1_2", "1_4", "1_8", "1_16")
        ))

    # ---------------------------------------------------------------- fields
    def field_fns(self, variables):
        field_fn = lambda z, x: self.mlp.apply(variables["mlp"], z, x)
        gauss_fn = lambda z, x: self.mlp_gaussian.apply(variables["mlp_gaussian"], z, x)
        return field_fn, gauss_fn

    # ---------------------------------------------------------------- render
    def render_rays(
        self,
        variables: Dict[str, Any],
        pyramid: R.FeaturePyramid,
        cam_K: jnp.ndarray,
        T_source2infer: jnp.ndarray,
        pixels: jnp.ndarray,
        key: jax.Array,
        ray_chunk: Optional[int] = None,
        remat: Optional[bool] = None,
        row_offset: Any = 0,
        total_rows: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render a batch of rays (ref render_rays_batch, scenerf.py:392-471).

        row_offset/total_rows: render a slice of a larger ray batch with
        noise identical to the full render (see rendering.render_rays)."""
        field_fn, gauss_fn = self.field_fns(variables)
        return R.render_rays(
            key, pixels, pyramid, cam_K, T_source2infer, field_fn, gauss_fn,
            self.cfg, ray_chunk=ray_chunk, remat=remat,
            row_offset=row_offset, total_rows=total_rows,
        )

    # --------------------------------------------------------------- forward
    def forward(
        self,
        variables: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        key: jax.Array,
        train: bool = True,
        with_depth_eval: bool = True,
        sphere_maps: Optional[Dict[int, jnp.ndarray]] = None,
        item_loop: bool = False,
        ray_shard_n: int = 1,
        with_losses: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Full training/validation forward pass (ref scenerf.py:119-241).

        `with_losses=False` skips the per-source loss renders entirely and
        returns only the GT-depth metrics (total_loss = 0): a depth-eval-only
        program is ~100x smaller than the full forward (no n_rays x 64-sample
        training render per source), so it co-fits in HBM next to even the
        8-source train program (VERDICT r4 item: quality validation at the
        amortization endpoint). Requires with_depth_eval=True.

        Returns (total_loss, metrics dict, updated variables). Losses are
        summed over valid sources and divided by the local batch size, matching
        the reference accumulation; metric logs are masked means.

        Batch items beyond the first are processed by `lax.map` so program
        size does not scale with the per-device batch; `item_loop=True` forces
        the unrolled per-item Python loop (parity testing).

        `ray_shard_n > 1` shards each item's n_rays across the mesh axis
        (SURVEY 2.2's "shard the ray batch across chips"): every device
        samples the same pixel set, renders its 1/n slice with per-ray noise
        drawn from the SHARED key for the full ray batch and row-sliced
        (sampling.row_noise), and the masked reprojection mean psums
        numerator/denominator -- one step is bit-identical (up to f32
        reduction order) to the unsharded ray batch.
        """
        cfg = self.cfg
        if not (with_losses or with_depth_eval):
            raise ValueError("forward with with_losses=False requires "
                             "with_depth_eval=True (nothing to compute)")
        B = batch["img_input"].shape[0]
        S_n = batch["T_source2infer"].shape[1]
        cam_K = batch["cam_K"][0]
        inv_K = jnp.linalg.inv(cam_K)

        levels, net_rgb_vars = self.encode(variables, batch["img_input"], cam_K,
                                           train=train, sphere_maps=sphere_maps)
        variables = {**variables, "net_rgb": net_rgb_vars}
        field_fn, gauss_fn = self.field_fns(variables)

        loss_keys = ("loss_reprojection", "loss_color", "loss_kl",
                     "loss_dist2closest_gauss")
        log_keys = ("min_som_vars", "min_stds", "closest_pts_to_depth",
                    "weights_at_depth")

        def per_source(pyramid, item_K, item_inv_K, src, k):
            """Losses for one (item, source) pair
            (ref process_single_source, scenerf.py:243-320)."""
            k_pix, k_render, k_noise, k_gt = jax.random.split(k, 4)
            res = {}
            if with_losses:
                pix_source = S.random_grid_pixels(
                    k_pix, cfg.n_rays, cfg.img_size[0], cfg.img_size[1],
                    stride=cfg.pixel_stride, grid_size=cfg.sample_grid_size,
                )
                row_offset: Any = 0
                total_rows = None
                if ray_shard_n > 1:
                    # same pixel set on every device (shared keys), each device
                    # renders its contiguous 1/n row slice; row_offset/total_rows
                    # make every noise draw identical to the unsharded step's
                    nr = cfg.n_rays // ray_shard_n
                    idx = jax.lax.axis_index(self.axis_name)
                    row_offset = idx * nr
                    total_rows = cfg.n_rays
                    pix_source = jax.lax.dynamic_slice(
                        pix_source, (row_offset, 0), (nr, 2))
                out = R.render_rays(
                    k_render, pix_source, pyramid, item_K, src["T_source2infer"],
                    field_fn, gauss_fn, cfg,
                    row_offset=row_offset, total_rows=total_rows,
                )
                color_src = geo.sample_pix_features(pix_source, src["img_source"])

                d2g = L.dist2closest_gaussian(
                    out["gaussian_means"], out["gaussian_stds"], out["som_vars"],
                    out["depth"],
                )
                loss_color = jnp.abs(out["color"] - color_src).mean()
                loss_reproj, valid = L.reprojection_loss(
                    k_noise, pix_source, color_src, out["depth"],
                    src["img_target"], item_inv_K, item_K, src["T_source2target"],
                    full_rows=total_rows, row_offset=row_offset,
                )

                res = {
                    "loss_reprojection": L.masked_mean(
                        loss_reproj, valid,
                        axis_name=self.axis_name if ray_shard_n > 1 else None),
                    "loss_color": loss_color,
                    "loss_kl": out["loss_kl"].mean(),
                    "loss_dist2closest_gauss": d2g["loss_dist2closest_gauss"].mean(),
                    "min_som_vars": d2g["min_som_vars"].mean(),
                    "min_stds": d2g["min_stds"].mean(),
                    "closest_pts_to_depth": out["closest_pts_to_depth"].mean(),
                    "weights_at_depth": out["weights_at_depth"].mean(),
                }

            if with_depth_eval:
                # depth metrics at GT pixels -- pure logging, no gradient
                # (ref scenerf.py:190-201)
                sg = jax.lax.stop_gradient
                gt_pix, gt_depth, gt_mask = (
                    src["gt_pix"], src["gt_depth"], src["gt_mask"])
                ev_offset: Any = 0
                ev_total = None
                if ray_shard_n > 1:
                    # shard the GT rows across the mesh like the train rays
                    # (otherwise this no-grad render runs replicated on every
                    # device); metric masked means psum num/den below so the
                    # sharded metrics equal the replicated ones
                    gn = gt_pix.shape[0] // ray_shard_n
                    idx = jax.lax.axis_index(self.axis_name)
                    ev_offset = idx * gn
                    ev_total = gt_pix.shape[0]
                    gt_pix = jax.lax.dynamic_slice(
                        gt_pix, (ev_offset, 0), (gn, 2))
                    gt_depth = jax.lax.dynamic_slice(
                        gt_depth, (ev_offset,), (gn,))
                    gt_mask = jax.lax.dynamic_slice(
                        gt_mask, (ev_offset,), (gn,))
                eval_out = R.render_rays(
                    k_gt, gt_pix,
                    jax.tree_util.tree_map(sg, pyramid), item_K,
                    sg(src["T_source2infer"]),
                    lambda z, x: sg(field_fn(sg(z), sg(x))),
                    lambda z, x: sg(gauss_fn(sg(z), sg(x))),
                    cfg, ray_chunk=cfg.eval_ray_chunk, remat=False,
                    row_offset=ev_offset, total_rows=ev_total,
                )
                dm = L.depth_metrics(
                    gt_depth, eval_out["depth"],
                    mask=gt_mask > 0, max_depth=cfg.eval_depth,
                    axis_name=self.axis_name if ray_shard_n > 1 else None,
                )
                res.update({f"depth/{k}": v for k, v in dm.items()})
            return res

        def scan_sources(pyramid, item, k):
            keys = jax.random.split(k, S_n)
            # per-item intrinsics, as the reference uses cam_K[i] for rendering
            # (ref scenerf.py:158-159) while the encoder shares cam_K[0]
            item_K = item["cam_K"]
            item_inv_K = jnp.linalg.inv(item_K)

            def body(carry, xs):
                src, kk = xs
                res = per_source(pyramid, item_K, item_inv_K, src, kk)
                m = src["source_mask"]
                carry = jax.tree_util.tree_map(
                    lambda c, r: c + m * r, carry, res
                )
                return carry, None

            src_stack = {
                "T_source2infer": item["T_source2infer"],
                "T_source2target": item["T_source2target"],
                "img_source": item["img_sources"],
                "img_target": item["img_targets"],
                "source_mask": item["source_mask"],
                "gt_pix": item["gt_pix"],
                "gt_depth": item["gt_depth"],
                "gt_mask": item["gt_mask"],
            }
            res_keys = (list(loss_keys) + list(log_keys)) if with_losses else []
            if with_depth_eval:
                res_keys += [f"depth/{k}" for k in L.DEPTH_METRIC_NAMES]
            init = {k: jnp.zeros(()) for k in res_keys}
            unroll = max(1, min(int(getattr(cfg, "source_unroll", 1)), S_n))
            total, _ = jax.lax.scan(body, init, (src_stack, keys),
                                    unroll=unroll)
            return total

        item_keys = jax.random.split(key, B)
        n_valid_sources = batch["source_mask"].sum()
        items = {k: v for k, v in batch.items() if k != "img_input"}
        level_stack = tuple(
            levels[k] for k in ("1_1", "1_2", "1_4", "1_8", "1_16"))
        if B == 1 or item_loop:
            # B=1 (the published per-device batch) inlines the body directly;
            # item_loop=True keeps the unrolled path for parity testing
            sums = None
            for b in range(B):
                item = jax.tree_util.tree_map(lambda v: v[b], items)
                pyramid = self.pyramid_for_item(levels, b)
                t = scan_sources(pyramid, item, item_keys[b])
                sums = t if sums is None else jax.tree_util.tree_map(
                    jnp.add, sums, t)
        else:
            # lax.map over items: program size and compile time stay constant
            # in the per-device batch (the loop version re-traces the full
            # render stack B times)
            def per_item(args):
                item, levels_b, k = args
                return scan_sources(R.FeaturePyramid(levels=levels_b), item, k)

            per_b = jax.lax.map(per_item, (items, level_stack, item_keys))
            sums = jax.tree_util.tree_map(lambda x: x.sum(0), per_b)

        # losses: summed over sources, / bs (ref scenerf.py:203-241)
        denom = jnp.maximum(n_valid_sources, 1.0)
        if with_losses:
            totals = {k: sums[k] / B for k in loss_keys}
            total_loss = totals["loss_kl"] + totals["loss_dist2closest_gauss"] * cfg.dist2closest_weight
            if cfg.use_reprojection:
                total_loss = total_loss + totals["loss_reprojection"] * cfg.reprojection_weight
            if cfg.use_color:
                total_loss = total_loss + totals["loss_color"]
            metrics = {f"loss_{k.removeprefix('loss_')}": v
                       for k, v in totals.items()}
            metrics["loss_som_kl"] = metrics.pop("loss_kl")
        else:
            total_loss = jnp.zeros(())
            metrics = {}

        # logs: masked means over sources
        for k in sums:
            if k not in loss_keys:
                metrics[k] = sums[k] / denom
        metrics["total_loss"] = total_loss
        return total_loss, metrics, variables

    # ------------------------------------------------------------- rendering
    def render_image(
        self,
        variables: Dict[str, Any],
        pyramid: R.FeaturePyramid,
        cam_K: jnp.ndarray,
        T_source2infer: jnp.ndarray,
        key: jax.Array,
        stride: int = 1,
        ray_chunk: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render a full depth+color image at the given pose on a strided pixel
        grid (used by all eval/recon pipelines; ref render_colors.py:102-127,
        generate_novel_depths.py:116-152). Output maps are [H/stride, W/stride]."""
        cfg = self.cfg
        W, H = cfg.img_size
        xs = jnp.arange(0, W, stride, dtype=jnp.float32)
        ys = jnp.arange(0, H, stride, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        pixels = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
        chunk = ray_chunk or cfg.eval_ray_chunk
        padded, mask = R.pad_rays(pixels, chunk)
        out = self.render_rays(
            variables, pyramid, cam_K, T_source2infer, padded, key,
            ray_chunk=chunk, remat=False,
        )
        n = pixels.shape[0]
        h, w = len(ys), len(xs)
        return {
            "depth": out["depth"][:n].reshape(h, w),
            "color": out["color"][:n].reshape(h, w, 3),
        }

    def render_pose_sweep(
        self,
        variables: Dict[str, Any],
        pyramid: R.FeaturePyramid,
        cam_K: jnp.ndarray,
        poses: jnp.ndarray,  # [P, 4, 4]
        key: jax.Array,
        stride: int = 2,
        ray_chunk: Optional[int] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Render depth+color for a whole stack of poses in ONE program
        (lax.map over poses): the reconstruction sweep (~63 poses/frame,
        ref generate_novel_depths.py:81-152) without per-pose dispatch.
        Returns depth [P, H/stride, W/stride], color [P, ..., 3]."""
        cfg = self.cfg
        W, H = cfg.img_size
        xs = jnp.arange(0, W, stride, dtype=jnp.float32)
        ys = jnp.arange(0, H, stride, dtype=jnp.float32)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        pixels = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
        chunk = ray_chunk or cfg.eval_ray_chunk
        padded, _ = R.pad_rays(pixels, chunk)
        n = pixels.shape[0]
        h, w = len(ys), len(xs)
        keys = jax.random.split(key, poses.shape[0])

        def one(args):
            T, k = args
            out = self.render_rays(variables, pyramid, cam_K, T, padded, k,
                                   ray_chunk=chunk, remat=False)
            return {"depth": out["depth"][:n].reshape(h, w),
                    "color": out["color"][:n].reshape(h, w, 3)}

        return jax.lax.map(one, (poses, keys))
