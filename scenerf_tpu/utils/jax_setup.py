"""Process-level JAX setup shared by all entry points."""
from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache: the heavy encoder graphs
    compile once per machine, then load in seconds on every later process
    (bench, eval CLIs, resumed training).

    Also honors JAX_PLATFORMS explicitly: environments that preload a platform
    plugin via sitecustomize (this image registers `axon` there) defeat the
    env var, so `JAX_PLATFORMS=cpu scenerf-train-kitti ...` would silently run
    on the accelerator. Re-applying the env var here (before any backend
    query) restores the documented behavior.
    """
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms:
        # only act when the env asks for a DIFFERENT primary platform than the
        # config already has: the preloaded default (env "axon", config
        # "axon,cpu") must keep its cpu fallback backend
        current = (jax.config.jax_platforms or "").split(",")[0]
        wanted = env_platforms.split(",")[0]
        if wanted != current:
            try:
                jax.config.update("jax_platforms", env_platforms)
            except RuntimeError:
                pass  # backend already initialized; leave it be
    path = path or os.environ.get("SCENERF_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
