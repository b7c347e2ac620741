#!/bin/bash
# Round-5 evidence queue, phase 2 — run AFTER tools/r5_queue.sh completes.
# Strictly sequential (one JAX process at a time).
#   setsid nohup bash tools/r5_queue2.sh > results/r5_queue/queue2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
LOG=results/r5_queue
mkdir -p "$LOG" results/e2e_r5

step() {
    local artifact="$1" log="$2"; shift 2
    if [ -e "$artifact" ]; then
        echo "[queue2] skip: $artifact exists"
        return 0
    fi
    echo "[queue2] $(date +%H:%M:%S) start: $* -> $log"
    "$@" > "$log" 2>&1
    echo "[queue2] $(date +%H:%M:%S) done (rc=$?): $*"
}

# 1. VGG seed 0 (cached+fused) so the closing e2e runs have sweep
#    counterparts at the default seed.
step results/sweep_r5/fused_vgg_seed0.jsonl "$LOG/sweep_vgg0.log" \
    python tools/seed_sweep.py --archs vgg --seeds 0 --modes cached,fused \
    --out results/sweep_r5
python tools/summarize_sweep.py --dir results/sweep_r5 > "$LOG/summary2.log" 2>&1
python tools/history_identity.py --dir results/sweep_r5 \
    --out results/history_identity_r5.json > "$LOG/identity2.log" 2>&1
cat "$LOG/identity2.log"

# 2. Feature-graph roofline (VERDICT r4 #7).
step results/feature_roofline.json "$LOG/roofline.log" \
    python tools/feature_roofline.py

# 3. Closing ritual: full production e2e at the default seed, cached and
#    fused (VERDICT r4 #8). Fresh checkpoint dirs so resume never kicks in.
if [ ! -e results/e2e_r5/cached_cnn8_history.jsonl ]; then
    rm -rf checkpoints submissions
    step submissions/submission.csv "$LOG/e2e_cached.log" \
        python main.py e2e --mesh off
    for a in cnn8 vgg; do
        cp "checkpoints/$a/history.jsonl" "results/e2e_r5/cached_${a}_history.jsonl"
    done
    cp submissions/submission.csv results/e2e_r5/submission_cached.csv
fi
if [ ! -e results/e2e_r5/fused_cnn8_history.jsonl ]; then
    rm -rf checkpoints submissions
    step submissions/submission.csv "$LOG/e2e_fused.log" \
        python main.py e2e --fused --mesh off
    for a in cnn8 vgg; do
        cp "checkpoints/$a/history.jsonl" "results/e2e_r5/fused_${a}_history.jsonl"
    done
    cp submissions/submission.csv results/e2e_r5/submission_fused.csv
fi

# 4. soxr resampler model-level bound (VERDICT r4 #5): 4 training runs on
#    the spliced caches (chroma-only polyphase vs sinc), flagship seeds.
step results/soxr_model_ab.json "$LOG/soxr.log" \
    python tools/soxr_model_ab.py --seeds-cnn8 2 --seeds-vgg 5

# 5. bench on the final stack.
step results/bench_r5.json "$LOG/bench.log" bash -c \
    'python bench.py | tail -1 > results/bench_r5.json'

echo "[queue2] $(date +%H:%M:%S) ALL DONE"
