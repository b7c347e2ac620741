#!/bin/bash
# Round-5 evidence queue: every measurement the round-4 verdict demanded,
# re-run on the SHIPPED (post-_row_sum_stable) stack, strictly sequential
# (one JAX process at a time — single host core, one TPU chip).
#
# Resumable: each step is skipped when its primary artifact already exists.
# Run:  setsid nohup bash tools/r5_queue.sh > results/r5_queue/queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_queue
mkdir -p "$LOG" results/sweep_r5

step() {  # step <artifact> <log> <cmd...>
    local artifact="$1" log="$2"; shift 2
    if [ -e "$artifact" ]; then
        echo "[queue] skip: $artifact exists"
        return 0
    fi
    echo "[queue] $(date +%H:%M:%S) start: $* -> $log"
    "$@" > "$log" 2>&1
    local rc=$?
    echo "[queue] $(date +%H:%M:%S) done (rc=$rc): $*"
    return $rc
}

# 1+2. Seed sweeps on the shipped stack (VERDICT r4 #1). The feature cache at
# input/feature_cache was freshly built by this round's precompute and is
# version-stamped; cached runs reuse it, fused runs go from raw waveforms.
step results/sweep_r5/fused_cnn8_seed4.jsonl "$LOG/sweep_cnn8.log" \
    python tools/seed_sweep.py --archs cnn8 --seeds 0,1,2,3,4 \
    --modes cached,fused --out results/sweep_r5
step results/sweep_r5/fused_vgg_seed7.jsonl "$LOG/sweep_vgg.log" \
    python tools/seed_sweep.py --archs vgg --seeds 5,6,7 \
    --modes cached,fused --out results/sweep_r5
python tools/summarize_sweep.py --dir results/sweep_r5 > "$LOG/summary.log" 2>&1

# 3. Fused==cached identity at the history level (plain file compare).
python - <<'EOF' > "$LOG/identity.log" 2>&1
import filecmp, glob, os
ok = True
for f in sorted(glob.glob("results/sweep_r5/fused_*_seed*.jsonl")):
    c = f.replace("fused_", "cached_")
    same = os.path.exists(c) and filecmp.cmp(f, c, shallow=False)
    print(f"{os.path.basename(f)} == {os.path.basename(c)}: {same}")
    ok &= same
print("IDENTITY:", "ALL EQUAL" if ok else "DIVERGENT")
EOF
cat "$LOG/identity.log"

# 4. On-chip fused-identity probe at production geometry (VERDICT r4 #4).
step results/fused_identity_probe_r5.txt "$LOG/probe.log" \
    python tools/fused_identity_probe.py --n 512
[ -e results/fused_identity_probe_r5.txt ] || cp "$LOG/probe.log" results/fused_identity_probe_r5.txt

# 5. Parity sweep on the shipped stack (fresh device run, oracle sample).
step PARITY_SWEEP_r5.done "$LOG/parity.log" \
    python tools/parity_sweep.py --n-oracle 200 --fresh && touch PARITY_SWEEP_r5.done

# 6. Ensemble val metrics on the flagship checkpoints (VERDICT r4 #2/#3).
if [ ! -e results/ensemble_val.json ]; then
    python - > "$LOG/ensemble_pick.log" 2>&1 <<'EOF'
import glob, json, os, sys
sys.path.insert(0, ".")
from tpu_breath.train import checkpoint as ckpt_lib
picks = {}
for arch in ("cnn8", "vgg"):
    best, best_acc = None, -1.0
    for p in glob.glob(f"results/sweep_r5/cached_{arch}_seed*.jsonl"):
        rows = [json.loads(l) for l in open(p)]
        acc = max(r["val_acc"] for r in rows)
        if acc > best_acc:
            seed = p.split("seed")[1].split(".")[0]
            run = f"results/sweep_r5/run_cached_{arch}_seed{seed}"
            ck = ckpt_lib.latest_checkpoint(os.path.join(run, "checkpoints", arch))
            if ck:
                best, best_acc = ck, acc
    picks[arch] = best
    print(arch, best_acc, best)
json.dump(picks, open("results/r5_queue/flagships.json", "w"))
EOF
    cat "$LOG/ensemble_pick.log"
    CNN8_CK=$(python -c "import json; print(json.load(open('results/r5_queue/flagships.json'))['cnn8'])")
    VGG_CK=$(python -c "import json; print(json.load(open('results/r5_queue/flagships.json'))['vgg'])")
    step results/ensemble_val.json "$LOG/ensemble.log" \
        python tools/ensemble_val.py --ckpt "cnn8=$CNN8_CK" --ckpt "vgg=$VGG_CK"
fi

# 7. MFU attribution split (VERDICT r4 #3).
step results/mfu_split.json "$LOG/mfu.log" python tools/mfu_split.py

echo "[queue] $(date +%H:%M:%S) ALL DONE"
