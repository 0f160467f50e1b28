"""Microbenchmark: scatter-add strategies at the featurization-backward
shapes (docs/ROADMAP.md #3 / VERDICT r2 item 2).

The backward of the point-featurization bilinear gathers scatter-adds
~4N = 307k weighted cotangent rows into the 5 pyramid level maps
(level 1: 678k rows x 80ch). TPU scatter-add serializes on conflicts;
this measures alternatives on-device:

  a) baseline        .at[ids].add(vals)           (what autodiff emits)
  b) sorted-add      sort by id + indices_are_sorted=True scatter-add
  c) cumsum-diff     sort + f32 cumsum + TWO plain (non-accumulating)
                     scatters (A = csum at run ends, B = csum before run
                     starts; out = A - B). No conflict combining at all.
  d) gather-verify   the forward gather at the same shapes, for scale

    python scripts/bench_scatter.py
"""
from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    return float(np.median(ts)), out


def main():
    from scenerf_tpu.utils.jax_setup import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for (rows, M, C) in [(678000, 307200, 80), (169500, 307200, 160),
                         (42375, 307200, 320)]:
        # ray-coherent-ish ids: sorted blocks of 64 samples with jitter,
        # mimicking samples marching along rays
        base = rng.integers(0, rows, size=(M // 64, 1))
        ids_np = np.clip(base + rng.integers(-400, 400, size=(M // 64, 64)),
                         0, rows - 1).reshape(-1).astype(np.int32)
        vals_np = rng.normal(size=(M, C)).astype(np.float32)
        ids = jnp.asarray(ids_np)
        vals = jnp.asarray(vals_np, jnp.bfloat16)

        @jax.jit
        def baseline(ids, vals):
            return jnp.zeros((rows, C), jnp.float32).at[ids].add(
                vals.astype(jnp.float32))

        @jax.jit
        def sorted_add(ids, vals):
            order = jnp.argsort(ids)
            return jnp.zeros((rows, C), jnp.float32).at[ids[order]].add(
                vals[order].astype(jnp.float32), indices_are_sorted=True)

        @jax.jit
        def cumsum_diff(ids, vals):
            order = jnp.argsort(ids)
            ids_s = ids[order]
            csum = jnp.cumsum(vals[order].astype(jnp.float32), axis=0)
            # A: last write wins at each id's run end (sequential scatter)
            A = jnp.zeros((rows, C), jnp.float32).at[ids_s].set(
                csum, mode="drop")
            csum_prev = jnp.concatenate(
                [jnp.zeros((1, C), jnp.float32), csum[:-1]], axis=0)
            # B: first occurrence wins (reverse order, last write = first)
            B = jnp.zeros((rows, C), jnp.float32).at[ids_s[::-1]].set(
                csum_prev[::-1], mode="drop")
            return A - B

        @jax.jit
        def fwd_gather(ids, table):
            return jnp.take(table, ids, axis=0)

        table = jnp.asarray(rng.normal(size=(rows, C)), jnp.bfloat16)

        t_a, out_a = timed(baseline, ids, vals)
        t_b, out_b = timed(sorted_add, ids, vals)
        t_c, out_c = timed(cumsum_diff, ids, vals)
        t_g, _ = timed(fwd_gather, ids, table)

        err_b = float(jnp.abs(out_b - out_a).max())
        err_c = float(jnp.abs(out_c - out_a).max())
        mx = float(jnp.abs(out_a).max())
        print(f"[{rows}x{C}] add={t_a * 1e3:7.2f} ms  "
              f"sorted={t_b * 1e3:7.2f} ms (err {err_b:.2e})  "
              f"cumsum={t_c * 1e3:7.2f} ms (err {err_c:.2e}, max {mx:.1f})  "
              f"gather={t_g * 1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
