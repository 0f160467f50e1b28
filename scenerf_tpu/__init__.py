"""scenerf_tpu: a TPU-native framework for self-supervised monocular 3D scene
reconstruction with conditioned radiance fields.

Re-designed from scratch for JAX/XLA/Pallas/TPU with the capabilities of the
SceneRF reference (astra-vision/SceneRF): novel depth synthesis, novel view
synthesis, and TSDF-fused occupancy reconstruction, trained from posed image
sequences only.

Layout:
  config        -- frozen experiment configs (kitti / bundlefusion presets)
  geometry      -- pure-jnp camera geometry + spherical mapping + pose sweeps
  encoding      -- NeRF positional encoding
  sampling      -- stratified / log / weighted / Gaussian-mixture ray samplers
  fields        -- conditioned ResnetFC radiance field MLP (flax.linen)
  som           -- vectorized RaySOM EM + KL (PrSamp update loss)
  rendering     -- fused sample->featurize->MLP->composite render core
  losses        -- reprojection (min-trick) / color / KL / dist2gauss losses
  model         -- the unified SceneRF model (one parameterized implementation)
  train         -- jitted + sharded train step, optimizer, checkpointing
  encoder/      -- EfficientNet encoder + spherical-grid decoder (UNet2DSphere)
  parallel/     -- device mesh + sharding helpers
  fusion/       -- TSDF volume fusion (XLA/Pallas) + marching cubes (native C++)
  data/         -- host-side KITTI / BundleFusion pipelines
  utils/        -- metrics (depth/image/SSC), logging, checkpoint helpers
  cli/          -- entry points mirroring the reference's 13 scripts
"""

__version__ = "0.1.0"
