#!/bin/bash
# One-shot TPU measurement session (run when the tunnel is healthy).
# Sequential — never two TPU processes at once — with a health gate first
# and a cool-down after any failure (a timeout-killed TPU process can
# wedge the tunnel ~5-10 min; stacking more processes prolongs it).
set -u
cd "$(dirname "$0")/../.."
LOG=/tmp/tpu_session
mkdir -p $LOG
# bench's own watchdog must fire BEFORE the outer kill so it exits cleanly
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
echo "tunnel healthy, starting probes"

run evaldec    900 python -u scripts/probes/probe_eval_decode_r2b.py
run featc      900 python -u scripts/probes/probe_features_r2c.py
run bench_tr   600 python bench.py
run bench_tr_c0 600 env JVT_C0_PACKED=auto python bench.py
run bench_tr_g 600 env JVT_GROUPED_CONV=auto python bench.py
# pipeline mode now defaults JVT_C0_PACKED=auto (bench.py) — the baseline
# arm must force it off to stay an A/B
run bench_pipe 600 env JVT_BENCH_MODE=pipeline JVT_C0_PACKED=0 python bench.py
run bench_pipe_c0 600 env JVT_BENCH_MODE=pipeline JVT_C0_PACKED=auto python bench.py
run bench_fuse 600 env JVT_BENCH_MODE=pipeline JVT_BENCH_FUSED=1 python bench.py
run bench_eval 700 env JVT_BENCH_MODE=eval python bench.py
run bench_ev_c0 700 env JVT_BENCH_MODE=eval JVT_C0_PACKED=auto python bench.py
run bench_mfu  600 env JVT_BENCH_MODE=mfu python bench.py
echo "=== done ($(date +%H:%M:%S)) ==="
