#!/bin/bash
# Round-5 TPU measurement session (run when the tunnel is healthy).
# Sequential — never two TPU processes at once — with a health gate first
# and a cool-down after any failure (a timeout-killed TPU process can
# wedge the tunnel ~5-10 min; stacking more processes prolongs it).
#
# Round-5 pending measurements (VERDICT r4 items 5 + 8):
#   1. eval-residual probe: input donation x batch {768,896,1024} sweep
#   2. train-step xprof attribution at the bench default (batch 1024)
#   3. bench.py train + eval revalidation at the round-5 HEAD
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/tpu_r5
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
    echo "rc=$rc tail:"; grep -v WARNING "$LOG/$name.log" | tail -14
    if [ $rc -ne 0 ]; then
        echo "cooling down 360s after failure"; sleep 360
        health || { echo "tunnel unhealthy — aborting session"; exit 1; }
    fi
}

health || { echo "tunnel unhealthy — not starting"; exit 1; }
echo "tunnel healthy, starting round-5 runs"

run eval_r5    1800 python -u scripts/probes/probe_eval_r5.py
run prof_train 1200 python -u scripts/profile_step.py --steps 10 --batch 1024
run bench_tr    600 python bench.py
run bench_eval  700 env JVT_BENCH_MODE=eval python bench.py
echo "=== done ($(date +%H:%M:%S)) ==="
