"""Capture a device profile of the flagship train step and dump top ops."""
import glob
import gzip
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
from scenerf_tpu.train import Trainer

N_SOURCES = int(os.environ.get("TRACE_SOURCES", "1"))
REMAT = os.environ.get("TRACE_REMAT", "0")
REMAT = REMAT == "1" if REMAT in ("0", "1") else int(REMAT)
_RD = os.environ.get("TRACE_REMAT_DECODER")  # unset => follow TRACE_REMAT
REMAT_DECODER = None if _RD is None else _RD == "1"
cfg = C.kitti(n_sources=N_SOURCES, ray_chunk=1200, n_gt_depth=256,
              compute_dtype="bfloat16", remat_encoder=REMAT,
              remat_decoder=REMAT_DECODER)
mesh = make_mesh(jax.devices()[:1])
trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=1000, with_depth_eval=False)
state = trainer.create_state(jax.random.PRNGKey(0))
batch = shard_batch(make_batch(cfg, batch_size=1), mesh)
key = jax.random.PRNGKey(1)

state, m = trainer.train_step(state, batch, key)
jax.block_until_ready(m["total_loss"])

logdir = "/tmp/scenerf_trace"
jax.profiler.start_trace(logdir)
for i in range(3):
    state, m = trainer.train_step(state, batch, jax.random.fold_in(key, i))
jax.block_until_ready(m["total_loss"])
jax.profiler.stop_trace()
print("trace done")

# parse perfetto trace
paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
print("trace files:", paths)
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep device lanes only (XLA ops)
    agg = {}
    for e in events:
        name = e.get("name", "?")
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"] / 1e3  # us -> ms
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
    total = sum(v[1] for _, v in agg.items())
    print(f"== {os.path.basename(p)}: total {total:.1f} ms over 3 steps ==")
    for name, (cnt, ms) in top:
        print(f"  {ms:9.2f} ms x{cnt:5d}  {name[:110]}")
