"""Multi-chip (GSPMD) tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.algo import ppo as ppo_mod
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.parallel.mesh import make_mesh, replicate, shard_env_batch
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device")


def test_ppo_epoch_under_dp_sharding_matches_single_device():
    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    ppo_cfg = ppo_mod.PPOConfig(horizon=4, mini_epochs=2)
    n_envs = 16

    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(0)
    )
    step = jax.jit(train_epoch)

    # single-device baseline
    s1, m1 = step(state)

    # dp-sharded over the full mesh
    mesh = make_mesh()
    env_state = shard_env_batch(state.env_state, mesh)
    rest = replicate(state._replace(env_state=None), mesh)
    sharded = rest._replace(env_state=env_state)
    s2, m2 = step(sharded)

    # identical math (same seeds, GSPMD only changes layout)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    np.testing.assert_allclose(float(m1["episode/reward"]),
                               float(m2["episode/reward"]), rtol=2e-4)
    # params stay replicated and finite
    for leaf in jax.tree_util.tree_leaves(s2.params):
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_sensors_on_epoch_under_dp_sharding_matches_single_device():
    """The sensor path — render-on-demand argsort/gather, sensor FIFO queues,
    tactile/depth/seg/pcl renderers — compiled and executed under a dp-sharded
    mesh must produce the same frames as the single-device layout (GSPMD
    gathers across shard boundaries are where sharding breaks silently;
    VERDICT r2). Reference DP all-reduce parity: frozen_ppo.py:586-603."""
    import dataclasses

    cfg0 = default_task_config()
    cfg = cfg0.replace(env=dataclasses.replace(
        cfg0.env, tactile=True, external_cam=True, depth_cam=True,
        seg_cam=True, pcl_cam=True, render_capacity=0.75))
    model = build_kuka_openhand()
    subs = build_subassembly_set(names=("yellow_round_peg_2in",))
    ppo_cfg = ppo_mod.PPOConfig(horizon=2, mini_epochs=1)
    n_envs = 16

    net, tx, state, train_epoch = ppo_mod.build(
        cfg, ppo_cfg, model, subs, n_envs, jax.random.PRNGKey(3)
    )
    step = jax.jit(train_epoch)

    s1, m1 = step(state)

    mesh = make_mesh()
    env_state = shard_env_batch(state.env_state, mesh)
    rest = replicate(state._replace(env_state=None), mesh)
    sharded = rest._replace(env_state=env_state)
    s2, m2 = step(sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    # sharded-vs-single sensor-frame equivalence (tactile / img / seg / pcl):
    # same seeds → identical render selections and frames up to layout
    for name in ("tactile_queue", "img_queue", "seg_queue", "pcl_queue"):
        a = np.asarray(getattr(s1.env_state, name), np.float32)
        b = np.asarray(getattr(s2.env_state, name), np.float32)
        np.testing.assert_allclose(a, b, atol=2e-3, err_msg=name)


def test_env_state_sharding_layout():
    mesh = make_mesh()
    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    from isaacgyminsertion_tpu.envs import insertion

    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(0), 16)
    sharded = shard_env_batch(state, mesh)
    # env-batch leaves are split across devices on axis 0
    q_shard = sharded.phys.q.sharding
    assert len(q_shard.device_set) == len(jax.devices())
