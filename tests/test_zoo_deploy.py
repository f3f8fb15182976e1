"""Model zoo, vec-env wrapper, RNA, deploy-loop tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from isaacgyminsertion_tpu.models import zoo
from isaacgyminsertion_tpu.utils.rna import RandomNetworkAdversary


def test_zoo_forward_shapes():
    rng = jax.random.PRNGKey(0)
    # legacy AC + AdaptTConv
    ac = zoo.ActorCritic(use_ft=True)
    p = ac.init(rng, jnp.zeros((2, 15)), jnp.zeros((2, 30, 6)))
    mu, log_std, v = ac.apply(p, jnp.zeros((2, 15)), jnp.zeros((2, 30, 6)))
    assert mu.shape == (2, 6) and v.shape == (2,)
    # TCN + transformer
    tcn = zoo.TCN()
    p = tcn.init(rng, jnp.zeros((2, 16, 12)))
    assert tcn.apply(p, jnp.zeros((2, 16, 12))).shape == (2, 8)
    tt = zoo.TactileTransformer()
    p = tt.init(rng, jnp.zeros((2, 5, 32)))
    assert tt.apply(p, jnp.zeros((2, 5, 32))).shape == (2, 8)
    # PointMAE + chamfer
    mae = zoo.PointMAE(num_out_points=32)
    pts = jax.random.normal(rng, (2, 64, 3))
    mask = jnp.ones((2, 64)).at[:, 32:].set(0.0)
    p = mae.init(rng, pts, mask)
    recon, feat = mae.apply(p, pts, mask)
    assert recon.shape == (2, 32, 3)
    assert float(zoo.chamfer_distance(recon, pts)) > 0
    # resnet + vae
    rn = zoo.TactileResNet()
    p = rn.init(rng, jnp.zeros((2, 64, 64, 3)))
    assert rn.apply(p, jnp.zeros((2, 64, 64, 3))).shape == (2, 64)
    vae = zoo.TactileVAE()
    p = vae.init(rng, jnp.zeros((2, 64, 64, 3)), rng)
    recon, mu, logvar = vae.apply(p, jnp.zeros((2, 64, 64, 3)), rng)
    assert recon.shape == (2, 64, 64, 3)
    # cyclegan
    g = zoo.ResnetGenerator()
    p = g.init(rng, jnp.zeros((1, 64, 64, 3)))
    out = g.apply(p, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 64, 64, 3)
    d = zoo.PatchDiscriminator()
    p = d.init(rng, out)
    pred = d.apply(p, out)
    assert float(zoo.lsgan_loss(pred, True)) >= 0


def test_rna_perturbs_within_bounds():
    rna = RandomNetworkAdversary(obs_dim=15)
    obs = jnp.zeros((4, 15))
    acts = jnp.zeros((4, 6))
    out = rna.perturb(jax.random.PRNGKey(1), obs, acts)
    assert out.shape == (4, 6)
    assert float(jnp.max(jnp.abs(out))) <= 1.0
    before = out
    rna.refresh(jax.random.PRNGKey(2))
    after = rna.perturb(jax.random.PRNGKey(1), obs, acts)
    assert float(jnp.max(jnp.abs(before - after))) > 0  # weights re-drawn


def test_vec_env_gym_api():
    from isaacgyminsertion_tpu.envs.vec_env import make

    env = make("FactoryTaskInsertionTactile", num_envs=4)
    obs_dict = env.reset()
    assert obs_dict["obs"].shape == (4, env.num_observations)
    obs_dict, rew, reset, extras = env.step(np.zeros((4, 6)))
    assert rew.shape == (4,) and "time_outs" in extras
    assert obs_dict["priv_info"].shape == (4, env.num_states)


def test_deploy_loop_runs_in_sim(tmp_path):
    import isaacgyminsertion_tpu.algo.ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.deploy import HardwarePlayer, SimInterface
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
    from isaacgyminsertion_tpu.utils.checkpoint import Checkpointer

    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    _, _, st, _ = ppo_mod.build(cfg, ppo_mod.PPOConfig(horizon=2, mini_epochs=2),
                                model, subs, 2, jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save_last({"params": st.params, "obs_rms": st.obs_rms,
                  "priv_rms": st.priv_rms, "value_rms": st.value_rms}, 0)
    player = HardwarePlayer(str(tmp_path / "last"), cfg)
    hw = SimInterface(cfg)
    steps = player.deploy(hw, num_steps=5)
    assert steps == 5 or hw.success


def test_student_deploy_loop_runs_in_sim(tmp_path):
    import isaacgyminsertion_tpu.algo.ext_adapt as ea
    import isaacgyminsertion_tpu.algo.ppo as ppo_mod
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.deploy import SimInterface, StudentHardwarePlayer
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand
    from isaacgyminsertion_tpu.utils.checkpoint import Checkpointer

    cfg = default_task_config()
    model = build_kuka_openhand()
    subs = build_subassembly_set()
    _, _, st, _ = ppo_mod.build(cfg, ppo_mod.PPOConfig(horizon=2, mini_epochs=2),
                                model, subs, 2, jax.random.PRNGKey(0))
    tck = Checkpointer(str(tmp_path / "teacher"))
    tck.save_last({"params": st.params, "obs_rms": st.obs_rms,
                   "priv_rms": st.priv_rms, "value_rms": st.value_rms}, 0)

    da_cfg = ea.DAggerConfig(horizon=2, mini_epochs=1, use_obs=True)
    teacher = ea.TeacherBundle(params=st.params, obs_rms=st.obs_rms,
                               priv_rms=st.priv_rms)
    _, _, da_st, _ = ea.build(cfg, da_cfg, model, subs, 2, teacher,
                              jax.random.PRNGKey(1))
    sck = Checkpointer(str(tmp_path / "student"))
    sck.save_last({"student_params": da_st.student_params,
                   "stud_obs_rms": da_st.stud_obs_rms,
                   "pcl_rms": da_st.pcl_rms}, 0)

    player = StudentHardwarePlayer(str(tmp_path / "teacher" / "last"),
                                   str(tmp_path / "student" / "last"),
                                   da_cfg, cfg)
    hw = SimInterface(cfg)
    steps = player.deploy(hw, num_steps=3)
    assert steps == 3 or hw.success


def test_diffusion_deploy_loop_runs_in_sim(tmp_path):
    from isaacgyminsertion_tpu.deploy import DiffusionHardwarePlayer, SimInterface
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.models.diffusion import DiffusionPolicy
    from isaacgyminsertion_tpu.utils.checkpoint import Checkpointer

    cfg = default_task_config()
    pol = DiffusionPolicy(act_dim=cfg.env.num_actions,
                          obs_dim=cfg.env.num_obs_stud_hist * cfg.env.num_obs_student)
    params = pol.init(jax.random.PRNGKey(0))
    ck = Checkpointer(str(tmp_path))
    ck.save_last({"ema_params": params}, 0)
    player = DiffusionHardwarePlayer(str(tmp_path / "last"), cfg,
                                     execute_horizon=2)
    hw = SimInterface(cfg)
    steps = player.deploy(hw, num_steps=4)
    assert steps == 4 or hw.success


def test_pos_pred_deploy_loop_runs_in_sim(tmp_path):
    import dataclasses as dc

    from isaacgyminsertion_tpu.algo.tactile_runner import (
        TactileRegressionRunner,
        TactileRunnerConfig,
    )
    from isaacgyminsertion_tpu.deploy import PosPredHardwarePlayer, SimInterface
    from isaacgyminsertion_tpu.envs.config import default_task_config

    cfg = default_task_config()
    cfg = cfg.replace(env=dc.replace(cfg.env, tactile=True))
    # fit a tiny regressor on random frames just to have a checkpoint
    runner = TactileRegressionRunner(
        TactileRunnerConfig(epochs=1, batch_size=2), out_dir=str(tmp_path)
    )
    tact = np.random.rand(4, 3, 64, 64, 3).astype(np.float32)  # env tactile shape
    targets = np.random.rand(4, 7).astype(np.float32)
    runner.fit(tact, targets)
    player = PosPredHardwarePlayer(str(tmp_path / "last"), cfg)
    hw = SimInterface(cfg)
    steps = player.deploy(hw, num_steps=2)
    assert steps == 2 or hw.success
