#!/bin/bash
# Stage-1 teacher, round-4 phase G: fine-tune the banked best (teacher_r2b,
# 0.8428 authoritative eval) WITHOUT the anchor-KL + min-LR combination that
# froze phase F (VERDICT r3: clip_frac 0.068->0.0 = learning strangled), and
# with the timeout-bootstrap ablations the collapse telemetry indicts.
#
# Variants (pass as $3):
#   control  — re-warmed lr 1e-4, eval-gated ladder, NO anchor (baseline)
#   noboot   — control + value_bootstrap=False (full-scale rewards, no γV)
#   masksucc — control + bootstrap_mask_success=True (γV only on
#              non-inserted timeouts; success terminates with its real reward)
#
# Counterpart of the reference's scripts/train_s1.sh fine-tune invocation
# (frozen_ppo.py:677-683 is the quirk under test).
CKPT=${1:-checkpoints/teacher_r2b/best_success.ckpt}
OUT=${2:-outputs/teacher_g_control}
VARIANT=${3:-control}

EXTRA=""
case "$VARIANT" in
  control)  ;;
  noboot)   EXTRA="train.ppo.value_bootstrap=False" ;;
  masksucc) EXTRA="train.ppo.bootstrap_mask_success=True" ;;
  *) echo "unknown variant $VARIANT"; exit 1 ;;
esac

python train.py train.algo=PPO \
  num_envs=${NUM_ENVS:-1024} eval_envs=1024 seed=${SEED:-42} \
  task.reset_at_fails=True \
  checkpoint="$CKPT" \
  output="$OUT" \
  train.ppo.learning_rate=${LR:-1e-4} \
  train.ppo.anneal_ladder=True \
  train.ppo.anneal_patience=3 \
  train.ppo.anneal_decay=0.5 \
  train.ppo.anneal_min_lr=1.25e-5 \
  train.ppo.anchor_coef=0.0 \
  eval_freq_steps=${EVAL_FREQ:-10e6} \
  train.ppo.max_agent_steps=${MAX_STEPS:-4.0e8} \
  $EXTRA \
  "${@:4}"
