#!/bin/bash
# Round-3 TPU session, part B (resume after the im64_b512 tunnel wedge):
#   1. remaining second-geometry A/Bs (item 2): nopack / c0 packing
#   2. flagship re-measures (train/mfu/eval — eval now defaults to the
#      bf16 epilogue + batch 768 measured in part A)
#   3. eval xprof attribution at the new default vs canonical (item 3)
#   4. WIM inversion study, gaussian + tilted families (item 4)
#   5. tail: im64 batch 512 retry under a 900s watchdog (its first attempt
#      outlived the 420s watchdog and wedged the tunnel)
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/tpu_r3
mkdir -p $LOG
export JVT_BENCH_WATCHDOG_S=420

health() {
    timeout 420 python -c \
        "import jax, jax.numpy as jnp; jax.devices(); print(float(jnp.ones((4,4)).sum()))" \
        > "$LOG/health.log" 2>&1
}

wait_healthy() {  # retry the gate: the tunnel self-heals ~5-10 min
    for attempt in 1 2 3 4; do
        health && return 0
        echo "health attempt $attempt failed ($(date +%H:%M:%S)) — waiting 300s"
        [ "$attempt" = 4 ] && return 1
        sleep 300
    done
}

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 t=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$t" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    echo "rc=$rc tail:"; grep -v WARNING "$LOG/$name.log" | tail -12
    if [ $rc -ne 0 ]; then
        echo "cooling down 360s after failure"; sleep 360
        wait_healthy || { echo "tunnel unhealthy — aborting session"; exit 1; }
    fi
}

wait_healthy || { echo "tunnel unhealthy — not starting"; exit 1; }
echo "tunnel healthy, starting round-3b session"

run im64_nopack  700 env JVT_BENCH_GEOM=imagenet64 JVT_PACK=0 python bench.py
run im64_c0      700 env JVT_BENCH_GEOM=imagenet64 JVT_C0_PACKED=auto python bench.py

run flag_train   600 python bench.py
run flag_mfu     600 env JVT_BENCH_MODE=mfu python bench.py
run flag_eval    700 env JVT_BENCH_MODE=eval python bench.py

run prof_eval        700 python scripts/profile_step.py --eval --batch 768 --steps 8
run prof_eval_canon  700 env JVT_EVAL_NATIVE=0 python scripts/profile_step.py --eval --batch 768 --steps 8

run wim_inv     2700 python -u scripts/wim_inversion_study.py

run im64_b512    1000 env JVT_BENCH_GEOM=imagenet64 JVT_BENCH_BATCH=512 \
                      JVT_BENCH_WATCHDOG_S=900 python bench.py
echo "=== done ($(date +%H:%M:%S)) ==="
