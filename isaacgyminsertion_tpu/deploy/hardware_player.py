"""Real-robot deployment mirror (parity: algo/deploy/deploy_s2.py).

`HardwarePlayer` rebuilds the exact sim-side model stack (teacher actor +
RMS + student with modality flags) from the same checkpoints and config tree
that trained it (SURVEY.md §8.4 deploy mirror contract), and runs the action
loop against a `HardwareInterface`. The ROS/MoveIt transport of the reference
(algo/deploy/env/*, 3.6k LoC) is out of scope for the TPU core — the
interface protocol is the seam where it plugs in. `SimInterface` backs the
same loop with the simulator, so the deploy path is testable end-to-end
without hardware (and doubles as the reference's offline_training_w_env
replay check, train.py:124-128).

Deploy-specific action scales (deploy_s2.py:72-78) override the train-time
pos/rot scales.
"""

from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..envs import insertion
from ..envs.config import TaskConfig, default_task_config
from ..models.actor_critic import ActorCriticSplit
from ..models.running_mean_std import rms_normalize
from ..utils.checkpoint import restore_path


class HardwareInterface(Protocol):
    """Hardware seam: implement with ROS/MoveIt drivers on the robot host."""

    def get_observation(self) -> dict:
        """→ {'eef_pos', 'eef_quat', 'actions_prev', ...} numpy arrays."""
        ...

    def apply_action(self, delta_pos: np.ndarray, delta_rot: np.ndarray) -> None:
        ...

    def reset(self) -> None:
        ...


class SimInterface:
    """Simulator-backed HardwareInterface (deploy-loop testing without ROS)."""

    def __init__(self, cfg: TaskConfig, seed: int = 0):
        from ..assets import build_subassembly_set
        from ..physics.robot import build_kuka_openhand

        self.cfg = cfg
        self.model = build_kuka_openhand()
        self.subs = build_subassembly_set()
        self._step = jax.jit(lambda s, a: insertion.step(cfg, self.model, self.subs, s, a))
        self._key = jax.random.PRNGKey(seed)
        self.reset()

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self.state = insertion.reset_all(self.cfg, self.model, self.subs, k, 1)
        self._out = None

    def get_observation(self) -> dict:
        obs = self.state.obs_queue
        d = {"obs": np.asarray(obs)[0],
             "student_obs": np.asarray(self.state.obs_stud_queue)[0]}
        # sensor modalities (populated after the first step; zero-sized when
        # the modality is off — same contract as StepOutput)
        for k, q in (("tactile", self.state.tactile_queue),
                     ("img", self.state.img_queue),
                     ("seg", self.state.seg_queue),
                     ("pcl", self.state.pcl_queue)):
            d[k] = np.asarray(q)[0]
        return d

    def apply_action(self, delta_pos, delta_rot):
        # deploy commands are metric deltas (deploy_s2.py pos/rot_action_scale
        # applied by the player); the sim env consumes normalized [-1, 1]
        # actions and applies its own rl.*_action_scale — invert it here
        act = np.concatenate([
            np.asarray(delta_pos) / np.asarray(self.cfg.rl.pos_action_scale),
            np.asarray(delta_rot) / np.asarray(self.cfg.rl.rot_action_scale),
        ])
        act = jnp.asarray(np.clip(act, -1.0, 1.0)[None], jnp.float32)
        self.state, self._out = self._step(self.state, act)

    @property
    def success(self) -> bool:
        return bool(self.state.success_reset_buf[0])

    @property
    def eef_pose(self) -> tuple[np.ndarray, np.ndarray]:
        """(pos [3], quat [4]) of the fingertip-centered eef frame — the
        hardware-side pose the calibration loop compares against."""
        from ..physics.kinematics import forward_kinematics, site_pose
        from ..physics.robot import SITE_FINGERTIP_CENTERED

        fk = forward_kinematics(self.model, self.state.phys.q)
        q, t = site_pose(self.model, fk, SITE_FINGERTIP_CENTERED)
        return np.asarray(t[0]), np.asarray(q[0])


class HardwarePlayer:
    """deploy_s2.HardwarePlayer.deploy() mirror."""

    def __init__(self, teacher_ckpt: str, cfg: TaskConfig | None = None,
                 pos_action_scale=(0.002, 0.002, 0.002),
                 rot_action_scale=(0.01, 0.01, 0.01)):
        self.cfg = cfg or default_task_config()
        tree = restore_path(teacher_ckpt)
        self.params = tree["params"]
        self.obs_rms = tree["obs_rms"]
        self.priv_rms = tree["priv_rms"]
        obs_dim = self.cfg.env.num_obs_hist * self.cfg.env.num_observations
        self.net = ActorCriticSplit(
            num_actions=self.cfg.env.num_actions, obs_dim=obs_dim,
            priv_dim=self.cfg.env.num_states,
        )
        self.pos_action_scale = np.asarray(pos_action_scale)
        self.rot_action_scale = np.asarray(rot_action_scale)

        def act(obs):
            o = rms_normalize(self.obs_rms, obs)
            zeros_priv = jnp.zeros(obs.shape[:-1] + (self.cfg.env.num_states,), obs.dtype)
            # hardware has no privileged state: the actor runs on the zero
            # latent unless a student latent is injected (student deploy)
            mu, _, _, _, _ = self.net.apply(self.params, o, rms_normalize(self.priv_rms, zeros_priv))
            return jnp.clip(mu, -1.0, 1.0)

        self._act = jax.jit(act)

    def deploy(self, hw: HardwareInterface, num_steps: int = 500,
               logger=None) -> int:
        """Run the 60 Hz action loop; returns executed steps. `logger` is an
        optional data.logger.DataLoggerReal recording the rollout."""
        hw.reset()
        for t in range(num_steps):
            ob = hw.get_observation()
            act = np.asarray(self._act(jnp.asarray(ob["obs"][None], jnp.float32)))[0]
            hw.apply_action(act[:3] * self.pos_action_scale, act[3:] * self.rot_action_scale)
            done = bool(getattr(hw, "success", False)) or t == num_steps - 1
            if logger is not None:
                logger.add_step(ob, act, done=done)
            if done and t < num_steps - 1:
                return t + 1
        return num_steps


class StudentHardwarePlayer(HardwarePlayer):
    """Student deploy (deploy_s2.py:54-167 mirror): the student predicts the
    extrinsics latent (or, in only-BC mode, the action directly) from onboard
    modalities; the latent is injected into the frozen teacher actor
    (act_inference with student latent, models_split.py:154-199)."""

    def __init__(self, teacher_ckpt: str, student_ckpt: str, da_cfg,
                 cfg: TaskConfig | None = None,
                 pos_action_scale=(0.002, 0.002, 0.002),
                 rot_action_scale=(0.01, 0.01, 0.01)):
        super().__init__(teacher_ckpt, cfg, pos_action_scale, rot_action_scale)
        from ..algo.ext_adapt import DAggerConfig, _student_inputs  # noqa: F401
        from ..models.student import MultiModalModel

        self.da_cfg = da_cfg
        tree = restore_path(student_ckpt)
        self.student_params = tree["student_params"]
        self.stud_obs_rms = tree["stud_obs_rms"]
        self.pcl_rms = tree["pcl_rms"]
        e = self.cfg.env
        self.student = MultiModalModel(
            use_obs=da_cfg.use_obs, use_tactile=da_cfg.use_tactile,
            use_img=da_cfg.use_img, use_seg=da_cfg.use_seg, use_pcl=da_cfg.use_pcl,
            latent_dim=6 if da_cfg.only_bc else 8, bc_mode=da_cfg.only_bc,
            num_points=e.num_points if e.include_plug_pcl else 0,
            num_points_socket=e.num_points_socket if e.merge_socket_pcl else 0,
            num_points_goal=e.num_points_goal if e.merge_goal_pcl else 0,
        )

        def act(obs, inp):
            lat = self.student.apply(self.student_params, **inp)
            if da_cfg.only_bc:
                return lat  # 6-dim tanh action directly (only-BC mode)
            o = rms_normalize(self.obs_rms, obs)
            zeros_priv = jnp.zeros(obs.shape[:-1] + (self.cfg.env.num_states,), obs.dtype)
            mu, _, _, _, _ = self.net.apply(
                self.params, o, rms_normalize(self.priv_rms, zeros_priv), latent=lat
            )
            return jnp.clip(mu, -1.0, 1.0)

        self._act_student = jax.jit(act)

    def _inputs_of(self, ob: dict):
        from ..algo.ext_adapt import _seg_masks

        inp = {}
        if self.da_cfg.use_obs:
            inp["obs"] = rms_normalize(
                self.stud_obs_rms, jnp.asarray(ob["student_obs"][None], jnp.float32)
            )
        if self.da_cfg.use_tactile:
            inp["tactile"] = jnp.asarray(ob["tactile"][None], jnp.float32)
        if self.da_cfg.use_img:
            inp["img"] = jnp.asarray(ob["img"][None], jnp.float32)
        if self.da_cfg.use_seg:
            seg = jnp.asarray(ob["seg"][None], jnp.float32)
            inp["seg"] = _seg_masks(seg[:, -1])[:, None]
        if self.da_cfg.use_pcl:
            p = jnp.asarray(ob["pcl"][None], jnp.float32)
            inp["pcl"] = rms_normalize(self.pcl_rms, p[:, -1] if p.ndim == 4 else p)
        return inp

    def deploy(self, hw: HardwareInterface, num_steps: int = 500) -> int:
        hw.reset()
        for t in range(num_steps):
            ob = hw.get_observation()
            act = np.asarray(
                self._act_student(jnp.asarray(ob["obs"][None], jnp.float32),
                                  self._inputs_of(ob))
            )[0]
            hw.apply_action(act[:3] * self.pos_action_scale, act[3:] * self.rot_action_scale)
            if getattr(hw, "success", False):
                return t + 1
        return num_steps


class PosPredHardwarePlayer:
    """Position-prediction deploy (deploy_pos_pred.py mirror): a trained
    tactile→pose regressor (algo/tactile_runner.py) estimates the plug-in-hand
    pose from the fingertip tactile frames; the loop servos the predicted plug
    toward a target pose with a P-controller in action space."""

    def __init__(self, tactile_ckpt: str, cfg: TaskConfig | None = None,
                 pos_action_scale=(0.002, 0.002, 0.002),
                 rot_action_scale=(0.01, 0.01, 0.01),
                 target_pos=(0.5, 0.0, 0.0), gain: float = 1.0):
        from ..algo.tactile_runner import TactileRegressionRunner, TactileRunnerConfig

        self.cfg = cfg or default_task_config()
        self.runner = TactileRegressionRunner(TactileRunnerConfig(), out_dir="/tmp/pos_pred")
        tree = restore_path(tactile_ckpt)
        self.runner.params = tree["params"]
        self.pos_action_scale = np.asarray(pos_action_scale)
        self.rot_action_scale = np.asarray(rot_action_scale)
        self.target_pos = np.asarray(target_pos)
        self.gain = gain

    def deploy(self, hw: HardwareInterface, num_steps: int = 100) -> int:
        hw.reset()
        for t in range(num_steps):
            ob = hw.get_observation()
            tact = ob.get("tactile")
            if tact is None or tact.size == 0:
                break  # tactile modality off — nothing to predict from
            pred = self.runner.predict(tact[None, -1])[0]  # [pos 3, quat 4]
            err = self.target_pos - pred[:3]
            act = np.clip(self.gain * err / self.pos_action_scale, -1.0, 1.0)
            hw.apply_action(act * self.pos_action_scale, np.zeros(3))
            if getattr(hw, "success", False):
                return t + 1
        return num_steps


class DiffusionHardwarePlayer:
    """Diffusion-policy deploy (deploy_diffusion.py mirror): DDIM-samples an
    action chunk conditioned on the current student obs and executes it
    open-loop before re-planning."""

    def __init__(self, ckpt: str, cfg: TaskConfig | None = None,
                 pos_action_scale=(0.002, 0.002, 0.002),
                 rot_action_scale=(0.01, 0.01, 0.01),
                 execute_horizon: int = 4, seed: int = 0):
        from ..models.diffusion import DiffusionPolicy

        self.cfg = cfg or default_task_config()
        tree = restore_path(ckpt)
        self.params = tree.get("ema_params", tree.get("params"))
        self.policy = DiffusionPolicy(
            act_dim=self.cfg.env.num_actions,
            obs_dim=self.cfg.env.num_obs_stud_hist * self.cfg.env.num_obs_student,
        )
        self.execute_horizon = execute_horizon
        self.pos_action_scale = np.asarray(pos_action_scale)
        self.rot_action_scale = np.asarray(rot_action_scale)
        self._rng = jax.random.PRNGKey(seed)
        self._sample = jax.jit(
            lambda p, r, o: self.policy.sample_ddim(p, r, o)
        )

    def deploy(self, hw: HardwareInterface, num_steps: int = 500) -> int:
        hw.reset()
        t = 0
        while t < num_steps:
            ob = hw.get_observation()
            self._rng, k = jax.random.split(self._rng)
            chunk = np.asarray(
                self._sample(self.params, k,
                             jnp.asarray(ob["student_obs"][None], jnp.float32))
            )[0]
            for act in np.clip(chunk[: self.execute_horizon], -1.0, 1.0):
                hw.apply_action(act[:3] * self.pos_action_scale,
                                act[3:] * self.rot_action_scale)
                t += 1
                if getattr(hw, "success", False):
                    return t
                if t >= num_steps:
                    break
        return num_steps
