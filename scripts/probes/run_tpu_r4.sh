#!/bin/bash
# Round-4 TPU measurement session (run when the tunnel is healthy).
# Sequential — never two TPU processes at once — with a health gate first
# and a cool-down after any failure (a timeout-killed TPU process can
# wedge the tunnel ~5-10 min; stacking more processes prolongs it).
#
# Covers the round-4 pending measurements:
#   1. poscod mechanism study (verdict item 4) -> docs/POSCOD_QUALITY.json
#   2. L=128 eval operating point probe (verdict item 5) -> BENCH.md rows
#   3. bench.py + quality_run.py revalidation at the round-4 HEAD
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/tpu_r4
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
echo "tunnel healthy, starting round-4 runs"

run poscod     1800 python -u scripts/poscod_quality.py
run eval_l128  1500 python -u scripts/probes/probe_eval_l128.py
run bench_tr    600 python bench.py
run bench_eval  700 env JVT_BENCH_MODE=eval python bench.py
run quality     900 python -u scripts/quality_run.py
echo "=== done ($(date +%H:%M:%S)) ==="
