#!/bin/bash
# Round-4 chip pipeline. Priority order = VERDICT r3 "Next round" list:
#   1. student reservoir-replay DAgger (the round's top deliverable) from the
#      banked best teacher — the reference s2 recipe (obs+pcl only-BC,
#      256 envs) + dagger.replay_size (Ross-2011 aggregation; the norep
#      variant measurably diverges as beta->0, see ROUND4_NOTES)
#   2. student-driven eval + 10x10 noise study from the eval-gated best
#   3. teacher phase-G: bootstrap_mask_success ablation/fine-tune (the fix
#      the banked collapse telemetry indicts), eval-gated anneal ladder
#   4. authoritative 1024-env eval of the phase-G best
#   5. phase-G control variant (no mask, same re-warmed LR) — the clean
#      ablation pair for (3); capped shorter
#   6. perf follow-ups: profile_physics / profile_sensors / autotune_render
#      / roofline (twice-deferred; VERDICT r3 item 7)
#
# BANK-IMMEDIATELY RULE (VERDICT r3 item 3): every stage copies its terminal
# artifacts into checkpoints/ the moment it finishes; outputs/ does NOT
# survive the round. Copies happen here; commits happen in the main session.
set -u
cd "$(dirname "$0")/.."
mkdir -p outputs checkpoints/student_r4 checkpoints/teacher_r4g checkpoints/perf_r4

wait_tpu() {
  local deadline=$(( $(date +%s) + ${WAIT_TPU_DEADLINE_S:-1800} ))
  while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 300 python - <<'EOF'
import jax
d = jax.devices()
assert d and d[0].platform != "cpu", d
print("TPU up:", d)
EOF
    then
      return 0
    fi
    sleep 60
  done
  echo "wait_tpu: deadline exceeded, skipping stage" >&2
  return 1
}

bank() { # bank <src>... <dst-dir>
  local dst="${@: -1}"
  mkdir -p "$dst"
  for src in "${@:1:$#-1}"; do
    [ -e "$src" ] && cp -r "$src" "$dst/" && echo "banked $src -> $dst"
  done
}

TEACHER=${TEACHER:-checkpoints/teacher_r2b/best_success.ckpt}

echo "=== [1] student reservoir DAgger (obs+pcl only-BC, 256 envs) $(date) ==="
if wait_tpu; then
  CKPT="$TEACHER" NUM_ENVS=256 timeout "${STUDENT_S:-7200}" bash scripts/train_s2.sh \
    dagger.replay_size="${REPLAY_K:-400000}" \
    eval_freq_steps=2e6 eval_envs=256 max_epochs="${STUDENT_EPOCHS:-1000}" \
    output=outputs/student_r4_rep \
    > /tmp/r4p_student.log 2>&1
  echo "student rc=$? (124 = wall-clock cap)"
fi
bank outputs/student_r4_rep/metrics.jsonl outputs/student_r4_rep/best_success.ckpt \
     outputs/student_r4_rep/last.ckpt checkpoints/student_r4
grep -h "dagger eval" /tmp/r4p_student.log | tail -12

echo "=== [2] student eval + noise study (256 envs) $(date) ==="
for SCK in checkpoints/student_r4/best_success.ckpt checkpoints/student_r4/last.ckpt; do
  if [ -f "$SCK" ] && wait_tpu; then
    CKPT="$TEACHER" STUDENT_CKPT="$SCK" NUM_ENVS=256 \
      timeout 3600 bash scripts/eval_s2.sh noise_study=True \
      output=outputs/eval_student_r4 > /tmp/r4p_evalS.log 2>&1 && break
  fi
done
bank outputs/eval_student_r4/metrics.jsonl outputs/eval_student_r4/noise_study.png \
     checkpoints/student_r4
grep -h "Success Rate\|noise_study" /tmp/r4p_evalS.log 2>/dev/null | tail -12

echo "=== [3] teacher phase-G masksucc fine-tune $(date) ==="
if wait_tpu; then
  MAX_STEPS="${PHASE_G_STEPS:-4.0e8}" timeout "${PHASE_G_S:-5400}" \
    bash scripts/train_s1_g.sh "$TEACHER" outputs/teacher_g_masksucc masksucc \
    > /tmp/r4p_phaseG.log 2>&1
  echo "phase G rc=$? (124 = cap, fine: bests banked during training)"
fi
bank outputs/teacher_g_masksucc/metrics.jsonl outputs/teacher_g_masksucc/best_success.ckpt \
     checkpoints/teacher_r4g

echo "=== [4] authoritative eval of phase-G best $(date) ==="
BEST_G=checkpoints/teacher_r4g/best_success.ckpt
if [ -f "$BEST_G" ] && wait_tpu; then
  timeout 2700 python train.py train.algo=PPO test=True num_envs=1024 eval_envs=1024 \
    checkpoint="$BEST_G" output=outputs/eval_r4g > /tmp/r4p_evalG.log 2>&1
  SR_G=$(grep -oP 'Success Rate: \K[0-9.]+' /tmp/r4p_evalG.log | tail -1)
  echo "phase-G authoritative success: ${SR_G:-none} (banked r2b: 0.8428)"
  bank outputs/eval_r4g/metrics.jsonl checkpoints/teacher_r4g
fi

echo "=== [5] phase-G control variant (ablation pair) $(date) ==="
if [ "${RUN_CONTROL:-1}" = 1 ] && wait_tpu; then
  MAX_STEPS="${CONTROL_STEPS:-2.0e8}" timeout "${CONTROL_S:-3600}" \
    bash scripts/train_s1_g.sh "$TEACHER" outputs/teacher_g_control control \
    > /tmp/r4p_control.log 2>&1
  echo "control rc=$?"
  bank outputs/teacher_g_control/metrics.jsonl checkpoints/teacher_r4g/control
fi

echo "=== [6] perf follow-ups $(date) ==="
if wait_tpu; then
  for tool in "profile_physics.py" "profile_sensors.py 8192" "profile_sensors.py 256" \
              "autotune_render.py" "roofline.py"; do
    name=$(echo "$tool" | tr ' .' '__')
    timeout 2700 python tools/$tool > "outputs/perf_r4_${name}.log" 2>&1
    echo "tools/$tool rc=$?"
  done
  bank outputs/perf_r4_*.log checkpoints/perf_r4
fi

echo "=== pipeline done $(date) ==="
