"""DAgger with the full visuotactile modality set (tiny CPU smoke)."""

import dataclasses

import jax
import numpy as np

from isaacgyminsertion_tpu.algo import ext_adapt as ea
from isaacgyminsertion_tpu.algo import ppo as ppo_mod
from isaacgyminsertion_tpu.assets import build_subassembly_set
from isaacgyminsertion_tpu.envs.config import default_task_config
from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

MODEL = build_kuka_openhand()
SUBS = build_subassembly_set()


def test_dagger_with_seg_pcl_tactile():
    """train_s2.sh configuration: student on seg+pcl (+tactile) modalities."""
    cfg0 = default_task_config()
    cfg = cfg0.replace(env=dataclasses.replace(
        cfg0.env, tactile=True, external_cam=True, depth_cam=True,
        seg_cam=True, pcl_cam=True,
    ))
    ppo_cfg = ppo_mod.PPOConfig(horizon=2, mini_epochs=2)
    _, _, ps, _ = ppo_mod.build(cfg, ppo_cfg, MODEL, SUBS, 2, jax.random.PRNGKey(0))
    teacher = ea.TeacherBundle(ps.params, ps.obs_rms, ps.priv_rms)
    da = ea.DAggerConfig(horizon=2, mini_epochs=1, use_obs=True, use_tactile=True,
                         use_img=True, use_seg=True, use_pcl=True)
    student, tx, ds, train_epoch = ea.build(cfg, da, MODEL, SUBS, 2, teacher,
                                            jax.random.PRNGKey(1))
    step = jax.jit(train_epoch)
    for _ in range(2):
        ds, m = step(ds)
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["action_loss"]))
    # student params updated and finite
    for leaf in jax.tree_util.tree_leaves(ds.student_params):
        assert bool(np.isfinite(np.asarray(leaf)).all())


def test_student_eval_fn():
    """eval_s2.sh path: student-driven deterministic eval returns a rate."""
    from isaacgyminsertion_tpu.algo.trainer import make_student_eval_fn
    from isaacgyminsertion_tpu.models.actor_critic import ActorCriticSplit

    cfg0 = default_task_config()
    cfg = cfg0.replace(rl=dataclasses.replace(cfg0.rl, max_episode_length=6))
    ppo_cfg = ppo_mod.PPOConfig(horizon=2, mini_epochs=2)
    _, _, ps, _ = ppo_mod.build(cfg, ppo_cfg, MODEL, SUBS, 2, jax.random.PRNGKey(0))
    teacher = ea.TeacherBundle(ps.params, ps.obs_rms, ps.priv_rms)
    da = ea.DAggerConfig(horizon=2, mini_epochs=1)
    student, tx, ds, _ = ea.build(cfg, da, MODEL, SUBS, 2, teacher,
                                  jax.random.PRNGKey(1))
    obs_dim = cfg.env.num_obs_hist * cfg.env.num_observations
    net = ActorCriticSplit(num_actions=cfg.env.num_actions, obs_dim=obs_dim,
                           priv_dim=cfg.env.num_states)
    eval_fn = make_student_eval_fn(cfg, da, MODEL, SUBS, net, teacher, student,
                                   n_envs=2, chunk=3)
    sr = eval_fn(ds.student_params, ds.stud_obs_rms, ds.pcl_rms,
                 jax.random.PRNGKey(2))
    assert 0.0 <= sr <= 1.0


def test_gan_sim2real_hook_transforms_tactile():
    """gan_params routes rendered tactile through the CycleGAN generator
    in-graph (factory_task_insertion.py:539-543 parity)."""
    import jax.numpy as jnp

    from isaacgyminsertion_tpu.envs import insertion as ins
    from isaacgyminsertion_tpu.models.zoo import ResnetGenerator

    cfg0 = default_task_config()
    cfg = cfg0.replace(
        sim=dataclasses.replace(cfg0.sim, substeps=1, solver_iters=2),
        env=dataclasses.replace(cfg0.env, tactile=True),
    )
    st = ins.reset_all(cfg, MODEL, SUBS, jax.random.PRNGKey(0), 2)
    # init a generator on the tactile frame shape
    h, w, c = st.tactile_queue.shape[-3:]
    gan = ResnetGenerator()
    gp = gan.init(jax.random.PRNGKey(1), jnp.zeros((1, h, w, c)))
    step_plain = jax.jit(lambda s, a: ins.step(cfg, MODEL, SUBS, s, a))
    step_gan = jax.jit(lambda s, a: ins.step(cfg, MODEL, SUBS, s, a, gan_params=gp))
    act = jnp.zeros((2, 6))
    _, out_p = step_plain(st, act)
    _, out_g = step_gan(st, act)
    a, b = np.asarray(out_p.tactile), np.asarray(out_g.tactile)
    assert a.shape == b.shape
    assert not np.allclose(a, b)              # the generator changed the frames
    assert np.isfinite(b).all() and b.min() >= 0.0 and b.max() <= 1.0
