#!/bin/bash
# Post-pipeline chip work (run AFTER scripts/chip_pipeline_r2b.sh finishes):
#   1. physics + sensors profiling (measures the plane-form contact/pcl wins)
#   2. render-kernel autotune (block_r sweep + gauss/ih4 noise ablation)
#   3. authoritative eval of the never-evaluated phase-C teacher
#   4. re-run bench.py with the best IGT_RENDER_BLOCK_R if autotune found one
# Each stage logs to /tmp/r2f_<stage>.log; failures don't break the chain.
set -u
cd "$(dirname "$0")/.."

if [ "${WAIT_FOR_PIPELINE:-1}" = "1" ]; then
  while ! grep -q "pipeline done" /tmp/chip_pipeline_r2b.log 2>/dev/null; do
    sleep 120
  done
fi

wait_tpu() {
  while true; do
    if timeout 300 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
EOF
    then return 0; fi
    sleep 60
  done
}

echo "=== [1] profile physics + sensors $(date) ==="
wait_tpu
timeout 1800 python tools/profile_physics.py > /tmp/r2f_physics.log 2>&1
timeout 1800 python tools/profile_sensors.py 8192 > /tmp/r2f_sensors.log 2>&1
tail -6 /tmp/r2f_sensors.log

echo "=== [2] render autotune $(date) ==="
wait_tpu
timeout 1800 python tools/autotune_render.py 8192 > /tmp/r2f_autotune.log 2>&1
cat /tmp/r2f_autotune.log

echo "=== [3] eval phase-C teacher $(date) ==="
wait_tpu
timeout 2400 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
  checkpoint=outputs/teacher_r2c/best_success.ckpt > /tmp/r2f_evalC.log 2>&1
grep -h "Success Rate" /tmp/r2f_evalC.log | tail -1

echo "=== [4] bench rerun $(date) ==="
wait_tpu
timeout 2400 python bench.py 2>/tmp/r2f_bench.err | tee /tmp/bench_r2_followup.json
echo "=== followup done $(date) ==="
