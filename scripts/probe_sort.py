"""Micro-probe: TPU rates for sort/argsort/cumsum/searchsorted/gather at the
featurize-backward problem sizes -- decides whether a sorted-segment-sum
d_img backward can beat the serialized scatter-add (docs/PERF.md round 5)."""
import time

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
dev = jax.devices()[0]
print(f"[sortprobe] device={dev.device_kind}", flush=True)


def bench(name, fn, *args, n=10):
    f = jax.jit(fn)
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.time() - t0)
    print(f"[sortprobe] {name}: {np.median(ts) * 1e3:.2f} ms", flush=True)


N4 = 307200  # 4 taps x 76800 samples
N1 = 76800
keys4 = jnp.asarray(rng.integers(0, 678000, N4), jnp.int32)
keys1 = jnp.asarray(rng.integers(0, 678000, N1), jnp.int32)
payload4 = jnp.arange(N4, dtype=jnp.int32)
g80 = jnp.asarray(rng.normal(size=(N4, 80)), jnp.bfloat16)
g1280 = jnp.asarray(rng.normal(size=(N1, 1280)), jnp.bfloat16)
q678 = jnp.arange(678000, dtype=jnp.int32)

bench("sort[307200] kv", lambda k, p: jax.lax.sort((k, p), num_keys=1),
      keys4, payload4)
bench("sort[76800] kv", lambda k, p: jax.lax.sort((k, p[:N1]), num_keys=1),
      keys1, payload4)
bench("argsort[307200]", jnp.argsort, keys4)
bench("gather-reorder[307200,80]", lambda g, p: jnp.take(g, p, axis=0),
      g80, payload4)
bench("cumsum f32 [307200,80]",
      lambda g: jnp.cumsum(g.astype(jnp.float32), axis=0), g80)
bench("cumsum f32 [76800,1280]",
      lambda g: jnp.cumsum(g.astype(jnp.float32), axis=0), g1280)
bench("searchsorted 678k in 307k", lambda k, q: jnp.searchsorted(k, q),
      jnp.sort(keys4), q678)
bench("scatter-add ref [678000,80]",
      lambda g, k: jnp.zeros((678000, 80), jnp.bfloat16).at[k].add(g),
      g80, keys4)
print("[sortprobe] DONE", flush=True)
