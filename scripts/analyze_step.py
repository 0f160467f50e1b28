"""Join the latest /tmp/scenerf_trace profile with the step's optimized HLO:
prints device ms/step grouped by model component (op_name metadata path).

Usage: python scripts/analyze_step.py [trace.json.gz]
Writes the optimized HLO to /tmp/step_hlo.txt (compile-cache hit if the
flagship config was just traced).
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

import jax

from scenerf_tpu.utils.jax_setup import setup_compilation_cache

setup_compilation_cache()

from scenerf_tpu import config as C
from scenerf_tpu.data.synthetic import make_batch
from scenerf_tpu.parallel.mesh import make_mesh, shard_batch
from scenerf_tpu.train import Trainer

cfg = C.kitti(n_sources=1, ray_chunk=1200, n_gt_depth=256,
              compute_dtype="bfloat16", remat_encoder=False)
mesh = make_mesh(jax.devices()[:1])
trainer = Trainer(cfg, mesh=mesh, steps_per_epoch=1000, with_depth_eval=False)
state = trainer.create_state(jax.random.PRNGKey(0))
batch = shard_batch(make_batch(cfg, batch_size=1), mesh)
maps = trainer._sphere_maps_for(batch)
compiled = trainer._train_step.lower(state, batch, jax.random.PRNGKey(1),
                                     maps).compile()
hlo = compiled.as_text()
open("/tmp/step_hlo.txt", "w").write(hlo)
print(f"hlo chars {len(hlo)}")

paths = sorted(glob.glob("/tmp/scenerf_trace/**/*.trace.json.gz",
                         recursive=True))
path = sys.argv[1] if len(sys.argv) > 1 else paths[-1]
data = json.load(gzip.open(path, "rt"))
pid_names = {e["pid"]: e["args"]["name"] for e in data["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = {p for p, n in pid_names.items() if "TPU" in n}
times = defaultdict(float)
steps = 0
for e in data["traceEvents"]:
    if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
        n = e["name"].split("(")[0]
        if n == "jit_per_shard":
            steps += 1
            step_ms = e["dur"] / 1e3
        if n in ("jit_per_shard", "1", "2", "5", "8") or n.endswith("-done"):
            continue
        times[e["name"].split("(")[0]] += e["dur"] / 1e3

opname = {}
pat = re.compile(r"%(\S+?) = .*metadata=\{op_name=\"jit\(per_shard\)/([^\"]*)\"")
for line in hlo.splitlines():
    m = pat.search(line)
    if m:
        opname[m.group(1)] = m.group(2)


def bucket(p):
    p = p.replace("transpose(jvp(", "bwd(").replace("jvp(", "fwd(")
    keep = []
    for part in p.split("/"):
        if part.startswith(("while", "body", "closed_call", "vmap", "jit",
                            "checkpoint", "remat", "bwd()", "fwd()")):
            continue
        keep.append(part)
    return "/".join(keep[:3]) or p.split("/")[-1]


agg = defaultdict(float)
for name, ms in times.items():
    p = opname.get(name)
    agg[bucket(p) if p else f"<{name.split('.')[0]}>"] += ms / max(steps, 1)
tot = sum(agg.values())
print(f"{steps} steps captured; total attributed device ms/step: {tot:.1f}")
for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    print(f"  {v:8.2f}  {k}")
