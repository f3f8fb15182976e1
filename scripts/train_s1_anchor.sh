#!/bin/bash
# Stage-1 teacher, phase F: fine-tune the banked best (teacher_r2b, 84.3% on
# the authoritative 1024-env eval) with the anchor-KL regularizer + the
# eval-gated anneal ladder, under the honest single-episode eval gate.
# Counterpart of the reference's scripts/train_s1.sh fine-tune invocation;
# the anchor/ladder levers are this framework's anti-collapse machinery
# (ROUND2_NOTES.md §3).
CKPT=${1:-checkpoints/teacher_r2b/best_success.ckpt}
OUT=${2:-outputs/teacher_r2f}
python train.py train.algo=PPO \
  num_envs=1024 eval_envs=1024 seed=42 \
  task.reset_at_fails=True \
  checkpoint="$CKPT" \
  output="$OUT" \
  train.ppo.learning_rate=5e-5 \
  train.ppo.anneal_ladder=True \
  train.ppo.anneal_patience=2 \
  train.ppo.anneal_decay=0.5 \
  train.ppo.anchor_coef=0.1 \
  train.ppo.max_agent_steps=1.0e9 \
  "${@:3}"
