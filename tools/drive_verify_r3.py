"""Verify drive: DAgger test_log noise study + train() NaN fail-fast guard.

Run from the repo root: `IGT_PLATFORM=cpu python tools/drive_verify_r3.py`.
Exercises the changed surface end-to-end through DAggerTrainer on CPU.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import tempfile

import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.algo.ext_adapt import DAggerConfig
from isaacgyminsertion_tpu.algo.trainer import DAggerTrainer
from isaacgyminsertion_tpu.envs.config import default_task_config

cfg0 = default_task_config()
cfg = cfg0.replace(
    rl=dataclasses.replace(cfg0.rl, max_episode_length=6),
    env=dataclasses.replace(cfg0.env, tactile=True, external_cam=True,
                            depth_cam=True, seg_cam=True, pcl_cam=True),
)
da = DAggerConfig(horizon=2, mini_epochs=1, use_obs=True, use_tactile=True,
                  use_seg=True, use_pcl=True)
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

model = build_kuka_openhand()
subs = build_subassembly_set()
out = tempfile.mkdtemp()

tr = DAggerTrainer(cfg, da, model, subs, n_envs=2, out_dir=out,
                   teacher_ckpt_path="checkpoints/teacher_r2b/best_success.ckpt")

# 1. noise-study surface (test_log): sweep two levels, one trial each
res = tr.test_log(noise_levels=(0.0, 0.01), trials=1, eval_envs=2)
for k, (m, s) in res.items():
    assert np.isfinite(m) and 0.0 <= m <= 1.0, (k, m)
print("test_log drive OK:", res)

# 2. NaN fail-fast guard: make train_epoch return a NaN loss and confirm
# train() aborts with RuntimeError after 3 epochs instead of looping
st = tr.state
tr.train_epoch = lambda s: (s._replace(epoch=s.epoch + 1),
                            {"loss": jnp.nan, "action_loss": jnp.nan,
                             "latent_loss": jnp.nan, "episode/success": jnp.zeros(()),
                             "episode/reward": jnp.zeros(()), "episode/beta": jnp.ones(())})
try:
    tr.train(max_epochs=10)
    raise SystemExit("FAIL: NaN guard did not trip")
except RuntimeError as e:
    assert "non-finite" in str(e), e
    print("NaN guard drive OK:", e)
print("ALL DRIVES PASSED")
