"""Microbenchmark: scatter-add strategies at the featurization-backward
shapes (docs/ROADMAP.md #3 / VERDICT r2 item 2).

The backward of the point-featurization bilinear gathers scatter-adds the
4 corner-tap cotangents of N sample points into each pyramid level map
(level 1: 678k rows x 80ch, N = 76.8k points -> 307k scattered rows). TPU
scatter-add serializes on conflicting indices; this measures alternatives
on-device at the real corner structure (per point: rows r0, r0+1, r0+W,
r0+W+1):

  a) baseline     .at[ids4].add(vals4)        (what autodiff emits: 4N rows)
  b) sorted       argsort ids4 + indices_are_sorted=True scatter-add
  c) cumsum-diff  sort + f32 cumsum + TWO plain (non-accumulating) scatters
                  (A = csum at run ends, B = csum before run starts; A - B).
                  No conflict combining at all.
  d) windowed-2   exploit x-adjacency: the (x0, x0+1) pair is contiguous in
                  the flat index, so scatter N updates of window [2, C] at
                  r0 and N at r1 -- half the update count, 2x the row size
  e) gather       the forward 4N-row gather at the same shapes, for scale
  f) gather-w2    the forward as 2N windowed [2, C] gathers

Inputs cycle across calls (the remote runtime may serve identical-input
calls from a result cache).

    JAX_PLATFORMS=axon python scripts/bench_scatter.py
"""
from __future__ import annotations

import time

import numpy as np


def timed(fn, args_list, n=8):
    import jax
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    ts = []
    for i in range(n):
        a = args_list[(i + 1) % len(args_list)]
        t0 = time.time()
        out = fn(*a)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    ts.sort()
    return ts[len(ts) // 2], out


def main():
    from scenerf_tpu.utils.jax_setup import setup_compilation_cache
    setup_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    print(f"[bench] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    # (H, W, C, N_points): pyramid levels 1 and 2 at the flagship's
    # 76.8k sample points (1200 rays x 64 samples)
    for (H, W, C, N) in [(452, 1500, 80, 76800), (226, 750, 160, 76800)]:
        rows = H * W
        # ray-coherent-ish corner bases: sorted blocks of 64 samples with
        # jitter, mimicking samples marching along rays
        base = rng.integers(0, rows - W - 2, size=(N // 64, 1))
        r0_np = np.clip(base + rng.integers(-400, 400, size=(N // 64, 64)),
                        0, rows - W - 2).reshape(-1).astype(np.int32)

        def vals4_of(seed):
            return rng.normal(size=(4 * N, C)).astype(np.float32)

        r0 = jnp.asarray(r0_np)
        ids4 = jnp.concatenate([r0, r0 + 1, r0 + W, r0 + W + 1])

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
            A = jnp.zeros((rows, C), jnp.float32).at[ids_s].set(
                csum, mode="drop")
            csum_prev = jnp.concatenate(
                [jnp.zeros((1, C), jnp.float32), csum[:-1]], axis=0)
            B = jnp.zeros((rows, C), jnp.float32).at[ids_s[::-1]].set(
                csum_prev[::-1], mode="drop")
            return A - B

        dnums = lax.ScatterDimensionNumbers(
            update_window_dims=(1, 2), inserted_window_dims=(),
            scatter_dims_to_operand_dims=(0,))

        @jax.jit
        def windowed2(r0, vals):
            # vals [4N, C] ordered (00, 10, 01, 11): rows (r0, r0+1) pair
            # and (r0+W, r0+W+1) pair -> two scatters of [N, 2, C] windows
            v = vals.astype(jnp.float32).reshape(4, -1, C)
            up0 = jnp.stack([v[0], v[1]], axis=1)   # [N, 2, C]
            up1 = jnp.stack([v[2], v[3]], axis=1)
            z = jnp.zeros((rows, C), jnp.float32)
            z = lax.scatter_add(z, r0[:, None], up0, dnums)
            return lax.scatter_add(z, (r0 + W)[:, None], up1, dnums)

        @jax.jit
        def fwd_gather(ids, table):
            return jnp.take(table, ids, axis=0)

        gnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,))

        @jax.jit
        def fwd_gather_w2(r0, table):
            g0 = lax.gather(table, r0[:, None], gnums, slice_sizes=(2, C))
            g1 = lax.gather(table, (r0 + W)[:, None], gnums,
                            slice_sizes=(2, C))
            return g0, g1

        vals_list = [jnp.asarray(vals4_of(i), jnp.bfloat16) for i in range(3)]
        table_list = [jnp.asarray(rng.normal(size=(rows, C)), jnp.bfloat16)
                      for _ in range(3)]

        t_a, out_a = timed(baseline, [(ids4, v) for v in vals_list])
        t_b, out_b = timed(sorted_add, [(ids4, v) for v in vals_list])
        t_c, out_c = timed(cumsum_diff, [(ids4, v) for v in vals_list])
        t_d, out_d = timed(windowed2, [(r0, v) for v in vals_list])
        t_e, _ = timed(fwd_gather, [(ids4, t) for t in table_list])
        t_f, _ = timed(fwd_gather_w2, [(r0, t) for t in table_list])

        # correctness vs baseline on the LAST cycled input
        err_b = float(jnp.abs(out_b - out_a).max())
        err_c = float(jnp.abs(out_c - out_a).max())
        err_d = float(jnp.abs(out_d - out_a).max())
        print(f"[{H}x{W}x{C}, N={N}] add={t_a * 1e3:7.2f}  "
              f"sorted={t_b * 1e3:7.2f} (err {err_b:.1e})  "
              f"cumsum={t_c * 1e3:7.2f} (err {err_c:.1e})  "
              f"win2={t_d * 1e3:7.2f} (err {err_d:.1e})  "
              f"gather={t_e * 1e3:6.2f}  gather_w2={t_f * 1e3:6.2f}  ms",
              flush=True)


if __name__ == "__main__":
    main()
