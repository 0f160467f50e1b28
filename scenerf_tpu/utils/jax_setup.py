"""Process-level JAX setup shared by all entry points."""
from __future__ import annotations

import os

import jax

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache: the heavy encoder graphs
    compile once per machine, then load in seconds on every later process
    (bench, eval CLIs, resumed training)."""
    path = path or os.environ.get("SCENERF_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
