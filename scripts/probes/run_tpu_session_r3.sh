#!/bin/bash
# Round-3 TPU measurement session (verdict items 2, 3, 4):
#   1. eval-residual probe: native-epilogue variants x batch (item 3)
#   2. xprof attribution of baseline + winner eval variant (item 3)
#   3. second train geometry: imagenet64 vgg16 C=1000 train + mfu (item 2)
#   4. flagship train re-measure (hoisted-sigma epilogue touched the train
#      native path) + eval bench with the winning variant
#   5. WIM inversion study (item 4)
# Sequential — never two TPU processes at once — health-gated, cool-down
# after failures (a killed TPU process wedges the tunnel ~5-10 min).
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

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 t=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$t" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    echo "rc=$rc tail:"; grep -v WARNING "$LOG/$name.log" | tail -12
    if [ $rc -ne 0 ]; then
        echo "cooling down 360s after failure"; sleep 360
        health || { echo "tunnel unhealthy — aborting session"; exit 1; }
    fi
}

# The tunnel self-heals ~5-10 min after a killed/timed-out TPU process:
# retry the health gate a few times before giving up.
for attempt in 1 2 3 4; do
    health && break
    echo "health attempt $attempt failed ($(date +%H:%M:%S)) — waiting 300s"
    [ "$attempt" = 4 ] && { echo "tunnel unhealthy — not starting"; exit 1; }
    sleep 300
done
echo "tunnel healthy, starting round-3 session"

# --- item 3: eval epilogue variants ---
run eval_r3     1200 python -u scripts/probes/probe_eval_r3.py

# --- item 2: second geometry ---
run im64_train   700 env JVT_BENCH_GEOM=imagenet64 python bench.py
run im64_mfu     700 env JVT_BENCH_GEOM=imagenet64 JVT_BENCH_MODE=mfu python bench.py
run im64_b128    700 env JVT_BENCH_GEOM=imagenet64 JVT_BENCH_BATCH=128 python bench.py
run im64_b512    700 env JVT_BENCH_GEOM=imagenet64 JVT_BENCH_BATCH=512 python bench.py
# packed-lowering A/B on the new geometry (decoder packing + packed first conv)
run im64_nopack  700 env JVT_BENCH_GEOM=imagenet64 JVT_PACK=0 python bench.py
run im64_c0      700 env JVT_BENCH_GEOM=imagenet64 JVT_C0_PACKED=auto python bench.py

# --- item 4 + flagship re-measures ---
run flag_train   600 python bench.py
run flag_mfu     600 env JVT_BENCH_MODE=mfu python bench.py
run flag_eval    700 env JVT_BENCH_MODE=eval python bench.py
run wim_inv     2700 python -u scripts/wim_inversion_study.py
echo "=== done ($(date +%H:%M:%S)) ==="
