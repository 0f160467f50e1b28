"""Parse a JAX perfetto trace: device-lane op aggregation only."""
import glob
import gzip
import json
import re
import sys

path = sys.argv[1] if len(sys.argv) > 1 else glob.glob(
    "/tmp/scenerf_trace/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(path, "rt") as f:
    data = json.load(f)

# identify device pids via process_name metadata
pid_names = {}
for e in data["traceEvents"]:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"]["name"]

device_pids = {p for p, n in pid_names.items()
               if "TPU" in n or "device" in n.lower() or "XLA" in n}
print("processes:", pid_names)

events = [e for e in data["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e]
print(f"{len(events)} device events")

def bucket(name):
    # group by op family
    name = name.split("(")[0]
    m = re.match(r"([a-zA-Z\-_]+)[\.\d]*", name)
    return m.group(1) if m else name

agg = {}
for e in events:
    b = bucket(e["name"])
    agg.setdefault(b, [0, 0.0])
    agg[b][0] += 1
    agg[b][1] += e["dur"] / 1e3
total = sum(v[1] for v in agg.values())
print(f"total device time {total:.1f} ms (3 steps)")
for name, (cnt, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:30]:
    print(f"  {ms:9.1f} ms ({100*ms/total:4.1f}%) x{cnt:6d}  {name}")

# top individual ops
agg2 = {}
for e in events:
    agg2.setdefault(e["name"], [0, 0.0])
    agg2[e["name"]][0] += 1
    agg2[e["name"]][1] += e["dur"] / 1e3
print("== top individual ops ==")
for name, (cnt, ms) in sorted(agg2.items(), key=lambda kv: -kv[1][1])[:25]:
    print(f"  {ms:9.1f} ms x{cnt:5d}  {name[:100]}")
