#!/bin/bash
# Stage-1 teacher, round-4 phase G2: the masksucc retry with the critic-only
# warmup. Phase G1 (outputs/teacher_g_masksucc) proved that switching
# bootstrap_mask_success=True under a restored 0.84 teacher with a live actor
# destroys it within 10M steps: the critic's inherited values are inflated
# relative to the rescaled timeout targets, advantages on success states go
# hugely negative, and PPO unlearns insertion (ROUND4_NOTES "Phase-G
# adjudicated"). G2 therefore:
#   - critic_warmup_steps=15e6: actor/priv/log_std gradients zeroed while the
#     critic re-fits to the masked targets (commit a3dc68f);
#   - lr 5e-5 (G1's 1e-4 is hot for a fine-tune);
#   - anneal_patience=5 so a flat-eval warmup window cannot trigger a
#     plateau-restore that would roll back the warmed critic.
# Reference quirk under test: frozen_ppo.py:677-683 (0.01-reward timeout
# bootstrap on success states).
CKPT=${1:-checkpoints/teacher_r2b/best_success.ckpt}
OUT=${2:-outputs/teacher_g2_masksucc}

python train.py train.algo=PPO \
  num_envs=${NUM_ENVS:-1024} eval_envs=1024 seed=${SEED:-42} \
  task.reset_at_fails=True \
  checkpoint="$CKPT" \
  output="$OUT" \
  train.ppo.learning_rate=${LR:-5e-5} \
  train.ppo.bootstrap_mask_success=True \
  train.ppo.critic_warmup_steps=${WARMUP:-15e6} \
  train.ppo.anneal_ladder=True \
  train.ppo.anneal_patience=5 \
  train.ppo.anneal_decay=0.5 \
  train.ppo.anneal_min_lr=1.25e-5 \
  train.ppo.anchor_coef=0.0 \
  eval_freq_steps=${EVAL_FREQ:-10e6} \
  train.ppo.max_agent_steps=${MAX_STEPS:-4.0e8} \
  "${@:3}"
