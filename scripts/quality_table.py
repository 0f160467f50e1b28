#!/usr/bin/env python
"""Summarize quality_runs.py JSON into the docs/PERF.md table: per arm,
mean +/- spread of best and final val abs_rel across seeds.

    python scripts/quality_table.py docs/quality_r5.json
"""
import json
import sys
from collections import defaultdict

import numpy as np


def main(path):
    with open(path) as f:
        results = json.load(f)
    arms = defaultdict(list)
    for tag, hist in results.items():
        arm = tag.split("@")[0]
        arms[arm].append(hist)
    print("| arm | seeds | best val abs_rel | final val abs_rel | "
          "mean wall s |")
    print("|---|---|---|---|---|")
    for arm, hists in arms.items():
        best = np.array([min(h["val_abs_rel"]) for h in hists])
        final = np.array([h["val_abs_rel"][-1] for h in hists])
        wall = np.array([h.get("wall_s", float("nan")) for h in hists])
        print(f"| {arm} | {len(hists)} | "
              f"{best.mean():.3f} +/- {best.std():.3f} | "
              f"{final.mean():.3f} +/- {final.std():.3f} | "
              f"{np.nanmean(wall):.0f} |")
    # per-seed detail for the appendix
    print()
    for tag, h in results.items():
        traj = " ".join(f"{v:.3f}" for v in h["val_abs_rel"])
        print(f"{tag}: {traj}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "docs/quality_r5.json")
