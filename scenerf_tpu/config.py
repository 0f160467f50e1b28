"""Experiment configuration for scenerf_tpu.

The reference keeps two copy-pasted model stacks (scenerf/models/scenerf.py and
scenerf_bf.py) whose differences are pure hyperparameters (ref scenerf.py:22-115,
scenerf_bf.py:27-120; diff catalogued in SURVEY.md section 2.9).  Here there is ONE
model parameterized by this frozen config; `kitti()` and `bundlefusion()` build the
two published presets.

All constants that are part of the reference behavior contract (SURVEY.md section
2.7) live here so they are checkpointed with the run.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SphereConfig:
    """Spherical (equirectangular) grid the feature pyramid lives on.

    Angles are in degrees; defaults are the KITTI camera FOV computed by the
    reference's determine_angles tool (ref scenerf/scripts/determine_angles.py,
    consumed at scenerf.py:80-88) enlarged by (add_fov_hor, add_fov_ver).
    """

    width: int = 1500
    height: int = 452
    v_angle_min: float = 75.4815
    v_angle_max: float = 104.7294
    h_angle_min: float = 49.5950
    h_angle_max: float = 131.1128
    add_fov_hor: float = 20.0
    add_fov_ver: float = 8.0

    @property
    def v_min(self) -> float:
        return self.v_angle_min - self.add_fov_ver

    @property
    def v_max(self) -> float:
        return self.v_angle_max + self.add_fov_ver

    @property
    def h_min(self) -> float:
        return self.h_angle_min - self.add_fov_hor

    @property
    def h_max(self) -> float:
        return self.h_angle_max + self.add_fov_hor

    @property
    def h_fov(self) -> float:
        return abs(self.h_max - self.h_min)

    @property
    def v_fov(self) -> float:
        return abs(self.v_max - self.v_min)


@dataclasses.dataclass(frozen=True)
class SceneRFConfig:
    """One config for the whole model + train/eval stack."""

    # ---- preset name (for experiment identity / logging) ----
    name: str = "kitti"

    # ---- image / camera ----
    img_size: Tuple[int, int] = (1220, 370)  # (W, H), ref scenerf.py:28
    sphere: SphereConfig = dataclasses.field(default_factory=SphereConfig)

    # ---- ray sampling (PrSamp) ----
    n_rays: int = 1200                 # ref scenerf.py:29 (train rays per source)
    n_pts_uni: int = 32                # ref scenerf.py:35
    n_gaussians: int = 4               # ref scenerf.py:34
    n_pts_per_gaussian: int = 8        # ref scenerf.py:36
    std: float = 2.5                   # base std added to predicted offset, ref :33
    max_sample_depth: float = 100.0    # ref scenerf.py:31
    max_infer_depth: float = 120.0     # ref scenerf.py:30
    eval_depth: float = 80.0           # ref scenerf.py:32
    min_sample_depth: float = 0.2      # d_min of samplers, ref models/utils.py:143
    min_clamp_depth: float = 0.1       # gaussian sample floor, ref models/utils.py:214
    mean_std_floor: float = 1.5        # "+1.5" floors, ref scenerf.py:592-594 (BF: 0.5)
    som_sigma: float = 2.0             # ref train_kitti.py:35
    kl_std_floor: float = 1.5          # ref ray_som_kl.py:83
    pixel_stride: int = 2              # training ray-pixel grid stride, ref scenerf.py:253
    sampling_method: str = "uniform"   # "uniform" | "log", ref scenerf.py:37
    sample_grid_size: int = 1          # BF divides rays over a grid, ref scenerf_bf.py:168

    # ---- field MLP ----
    d_hidden: int = 512                # ref scenerf.py:104
    n_blocks: int = 3                  # ref scenerf.py:103
    n_pe_freqs: int = 6                # ref scenerf.py:96-98
    d_latent: int = 2480               # 80+160+320+640+1280 pyramid concat, ref :105

    # ---- encoder ----
    encoder: str = "effnet-b7"         # "effnet-b7" | "effnet-b0" | "tiny"
    encoder_features: int = 2560       # bottleneck channels, ref unet2d_sphere.py:253
    bn_momentum: float = 0.99
    bn_eps: float = 1e-3

    # ---- losses ----
    use_color: bool = True             # ref scenerf.py:41
    use_reprojection: bool = True      # ref scenerf.py:42
    reprojection_weight: float = 1.0   # BF uses 5.0, ref scenerf_bf.py:214-217
    dist2closest_weight: float = 0.01  # ref scenerf.py:232 (BF: 0.1)
    som_mask_threshold: float = 0.1    # EM-update movement gate, ref ray_som_kl.py:70-71

    # ---- optimization ----
    lr: float = 1e-5                   # ref scenerf.py:26 (BF: 1e-4 in model, 2e-5 pub)
    weight_decay: float = 0.0          # ref scenerf.py:27
    lr_decay_gamma: float = 0.95       # per-epoch ExponentialLR, ref scenerf.py:760
    batch_size: int = 1                # per-device items; ref trains 1/GPU
    n_sources: int = 4                 # sources processed per step (padded+masked)
    n_gt_depth: int = 1024             # lidar GT pixels rendered for val metrics

    # ---- scene / reconstruction ----
    scene_size: Tuple[float, float, float] = (51.2, 51.2, 6.4)   # ref scenerf.py:72
    vox_origin: Tuple[float, float, float] = (0.0, -25.6, -2.0)  # ref scenerf.py:73
    voxel_size: float = 0.2
    tsdf_trunc_margin: float = 10.0    # ref depth2tsdf.py:89
    occ_threshold: float = 0.25        # tsdf2occ ramp base, ref eval_sr.py:11
    occ_max_threshold: float = 6.0     # tsdf2occ ramp cap, ref eval_sr.py:11
    # novel-pose sweep for reconstruction (ref models/utils.py:29, :6)
    sweep_step: float = 0.5
    sweep_angle: float = 10.0
    sweep_max_distance: float = 10.1

    # ---- execution (TPU) ----
    ray_chunk: int = 300               # rays per lax.scan block inside the jitted step
    eval_ray_chunk: int = 4096         # rays per block at eval (no grad)
    compute_dtype: str = "float32"     # "float32" | "bfloat16" for encoder/MLP matmuls
    remat_chunks: bool = True          # jax.checkpoint each ray chunk
    remat_encoder: bool | int = True   # nn.remat each MBConv/UpSampleBN;
                                       # int k remats only backbone stages
                                       # 0..k-1 (partial replay — pair with an
                                       # explicit remat_decoder, see below)
    remat_decoder: bool | None = None  # nn.remat the decoder UpSampleBN chain
                                       # separately; None follows
                                       # remat_encoder (the historical
                                       # coupled toggle). Remat placement is
                                       # a memory/replay trade with identical
                                       # math, so the splits are
                                       # interchangeable wherever they fit
    remat_field: bool = False          # jax.checkpoint featurize+field MLP of
                                       # each render block: drops the [N,
                                       # d_latent] gather concat and the MLP
                                       # hiddens from saved residuals (the two
                                       # largest render buffers; 1.46G +
                                       # 4x300M at 4 sources) for a ~5-10 ms
                                       # gather+matmul recompute in backward.
                                       # Bit-identical outputs/grads
    resample_gather: str = "taps"      # U-Net sphere RESAMPLER bilinear impl
                                       # (encoder->sphere grid, N ~= 678k
                                       # points/level): "taps" | "win2" |
                                       # "mm" | "mmseg". Stays "taps": its
                                       # backward scatters are small-C image
                                       # maps (~10 ms/step) while a seg sort
                                       # there would rank 4x678k keys
    featurize_gather: str = "taps"     # "taps" | "win2" | "mm": pyramid
                                       # bilinear sampling as 4 row-gathers
                                       # (autodiff scatter-add backward),
                                       # windowed [N,2,C] gathers/scatters,
                                       # or taps forward + one-hot-MATMUL
                                       # d_img backward for maps with
                                       # <= 4096 rows (ops/gather_scatter
                                       # bilinear_sample_mm; the round-5
                                       # trace showed the bottleneck-level
                                       # scatter-add costing 54 ms/step).
                                       # MEASURED (docs/PERF.md round 4):
                                       # win2 is ~15x slower at the 160-ch
                                       # stage on v5e; taps vs mm is a
                                       # round-5 probe
    decoder_conv: str = "conv"         # "conv" | "taps" | "taps3": decoder
                                       # 3x3 convs as nn.Conv or as im2col
                                       # matmuls (ops/conv_taps.py). MEASURED
                                       # (docs/PERF.md round 4): XLA's native
                                       # conv wins at every stage shape (2x
                                       # at 452x1500x80) -- the im2col K=9C
                                       # concat is bandwidth-bound. conv is
                                       # the decided default; taps/taps3 kept
                                       # as parity-tested alternates
    source_unroll: int = 1             # lax.scan unroll factor for the
                                       # per-source loop (model.scan_sources).
                                       # Semantically identical to unroll=1;
                                       # >1 gives XLA cross-source scheduling
                                       # freedom (can overlap one source's
                                       # serialized featurize-backward
                                       # scatters with another's MXU work) at
                                       # the cost of a bigger program

    # ---------------------------------------------------------------- helpers
    @property
    def n_pts_gauss(self) -> int:
        return self.n_gaussians * self.n_pts_per_gaussian

    @property
    def n_pts_per_ray(self) -> int:
        return self.n_pts_uni + self.n_pts_gauss

    @property
    def d_pe(self) -> int:
        return 3 + 2 * self.n_pe_freqs * 3

    @property
    def d_in(self) -> int:
        return self.d_pe + 3  # PE + viewdir

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    def replace(self, **kw) -> "SceneRFConfig":
        return dataclasses.replace(self, **kw)


def kitti(**overrides) -> SceneRFConfig:
    """The published KITTI (outdoor) preset (ref scenerf/scripts/train_kitti.py)."""
    return SceneRFConfig(name="kitti").replace(**overrides)


def bundlefusion(**overrides) -> SceneRFConfig:
    """The published BundleFusion (indoor) preset.

    Deltas vs KITTI per the reference diff (SURVEY.md section 2.9;
    ref scenerf_bf.py:27-120, train_bundlefusion.py:32-53).
    """
    cfg = SceneRFConfig(
        name="bundlefusion",
        img_size=(640, 480),
        sphere=SphereConfig(
            width=960,
            height=720,
            # ref scenerf_bf.py:85-90
            v_angle_min=69.125,
            v_angle_max=110.875,
            h_angle_min=64.6698,
            h_angle_max=115.3302,
            add_fov_hor=14.0,
            add_fov_ver=11.0,
        ),
        n_rays=1080,
        max_sample_depth=12.0,
        max_infer_depth=12.0,
        eval_depth=10.0,
        std=0.2,
        mean_std_floor=0.5,
        som_sigma=0.02,
        reprojection_weight=5.0,
        dist2closest_weight=0.1,
        lr=1e-4,
        sample_grid_size=2,
        scene_size=(4.8, 4.8, 3.84),
        vox_origin=(-2.4, -2.4, 0.0),
        voxel_size=0.04,
        sweep_step=0.2,
        sweep_angle=30.0,
        sweep_max_distance=2.1,
        ray_chunk=2048,  # one block covers both 1080 and 2048-ray batches
    )
    return cfg.replace(**overrides)


def tiny(**overrides) -> SceneRFConfig:
    """A small config for tests / smoke runs: full code paths, toy sizes."""
    cfg = SceneRFConfig(
        name="tiny",
        img_size=(64, 48),
        sphere=SphereConfig(width=80, height=64, add_fov_hor=5.0, add_fov_ver=3.0),
        n_rays=64,
        n_pts_uni=8,
        n_gaussians=3,
        n_pts_per_gaussian=4,
        d_hidden=32,
        n_blocks=2,
        d_latent=0,  # set by encoder build
        encoder="tiny",
        encoder_features=64,
        n_sources=2,
        n_gt_depth=32,
        ray_chunk=32,
        eval_ray_chunk=64,
    )
    return cfg.replace(**overrides)


PRESETS = {"kitti": kitti, "bundlefusion": bundlefusion, "tiny": tiny}
