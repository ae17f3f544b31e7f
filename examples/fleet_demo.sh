#!/usr/bin/env bash
# End-to-end mini fleet demo (runs anywhere; CPU-safe with tiny sizes):
# 1. sweep two configs with the grid tool
# 2. fleet-query + aggregate with the test CLI
# 3. emit LaTeX tables with the results CLI
# 4. sample grids + WIM fine-tune one job
set -e
cd "$(dirname "$0")/.."
JOBS=${JOBS:-/tmp/jvt_fleet_demo}
rm -rf "$JOBS"; mkdir -p "$JOBS"

cat > /tmp/fleet_grid.ini <<EOF
[sweep]
dataset = shapes32
type = cvae
latent-dim = 8 16
encoder = 64
decoder = 64
classifier = 16
gamma = 200
sigma = 0.2
epochs = 2
batch-size = 64
dataset-size = 512
test-batch-size = 128
no-final-ood = true
job-dir = $JOBS
EOF

python -m joint_vae_tpu.cli.grid /tmp/fleet_grid.ini --run

python -m joint_vae_tpu.cli.test --job-dir "$JOBS" --agg

cat > /tmp/fleet_tabs.ini <<EOF
[shapes-cvae]
type = cvae
set = shapes32
EOF
python -m joint_vae_tpu.cli.results /tmp/fleet_tabs.ini --job-dir "$JOBS" \
    --out-dir "$JOBS"

python -m joint_vae_tpu.cli.sample 1 --job-dir "$JOBS" --grids reco gen -N 4

python -m joint_vae_tpu.cli.ft 1 --job-dir "$JOBS" --epochs 1 \
    --moving-size 64 --train-size 128 --batch-size 32 \
    --test-batch-size 64 --oodsets uniform32

echo "fleet demo complete: $JOBS"

# Note: on the tunneled-TPU sandbox the WIM stage's first-time compiles can
# take tens of minutes (remote compile service); on CPU or a local TPU the
# whole demo runs in a few minutes.
