"""Banked-teacher quality regression (the learning-progress assertion the
round-1 suite lacked).

Loads the round-2 banked teacher checkpoint and runs the deterministic
full-episode evaluation on CPU. The banked policy scored 89% on its 64-env
TPU eval; the CPU re-eval at 16 envs must clear a generous floor — if this
fails after a physics/env change, the change altered the MDP the checkpoint
was trained on (retrain or re-bank deliberately, don't silence the test).
"""

import os

import jax
import pytest

from isaacgyminsertion_tpu.algo.trainer import make_eval_fn
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
from isaacgyminsertion_tpu.utils.checkpoint import restore_path

CKPT = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                    "teacher_r2b", "best_success")


@pytest.mark.skipif(not os.path.exists(CKPT + ".ckpt"),
                    reason="banked teacher checkpoint not present")
def test_banked_teacher_inserts():
    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    tree = restore_path(CKPT)
    net = ActorCriticSplit(num_actions=cfg.env.num_actions,
                           obs_dim=cfg.env.num_obs_hist * cfg.env.num_observations,
                           priv_dim=cfg.env.num_states)
    evaluate = make_eval_fn(cfg, model, subs, net, n_envs=16)
    sr = evaluate(tree["params"], tree["obs_rms"], tree["priv_rms"],
                  jax.random.PRNGKey(7))
    # TPU eval was 0.89 at 64 envs; 16-env CPU re-eval floor is generous to
    # absorb eval variance, NOT physics drift
    assert sr >= 0.5, f"banked teacher success {sr:.3f} < 0.5 — MDP drifted?"
