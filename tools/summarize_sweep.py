"""Aggregate a sweep directory's per-run histories into SUMMARY.json.

seed_sweep.py writes a summary only for the (mode, arch, seed) matrix of its
own invocation; this tool rebuilds the aggregate from EVERY *_<arch>_seed*.jsonl
in the directory so multi-invocation sweeps (e.g. results/sweep_r4/) end with
one complete summary. Per-mode keys carry per-seed best-epoch rows (all five
paper metrics when present).

Usage: python tools/summarize_sweep.py [--dir results/sweep_r4]
"""
import argparse
import glob
import json
import os
import re

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="results/sweep_r4")
    args = ap.parse_args()

    runs = {}
    for p in sorted(glob.glob(os.path.join(args.dir, "*_seed*.jsonl"))):
        m = re.match(r"(\w+)_(\w+)_seed(\d+)\.jsonl", os.path.basename(p))
        if not m:
            continue
        mode, arch, seed = m.group(1), m.group(2), int(m.group(3))
        rows = [json.loads(l) for l in open(p)]
        i = max(range(len(rows)), key=lambda i: rows[i]["val_acc"])
        best = rows[i]
        runs.setdefault(f"{mode}_{arch}", []).append(
            {"seed": seed, "epochs_run": len(rows),
             **{k: best[k] for k in ("epoch", "val_acc", "val_auc", "val_f1",
                                     "val_precision", "val_recall")
                if k in best}})

    summary = {}
    for key, rows in runs.items():
        accs = [r["val_acc"] for r in rows]
        summary[key] = {
            "n_seeds": len(rows),
            "val_acc_mean": float(np.mean(accs)),
            "val_acc_std": float(np.std(accs)),
            "val_acc_best": float(np.max(accs)),
            "val_auc_best": float(np.max([r["val_auc"] for r in rows])),
            "val_f1_best": float(np.max([r["val_f1"] for r in rows])),
            "per_seed": sorted(rows, key=lambda r: r["seed"]),
        }
    out = os.path.join(args.dir, "SUMMARY.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "per_seed"}
                      for k, v in summary.items()}, indent=1))
    print(f"written: {out}")


if __name__ == "__main__":
    main()
