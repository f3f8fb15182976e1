"""Gym-style vectorized env wrapper + task registry.

The object-API mirror of the reference's VecTask surface (vec_task.py:67-531
`Env`/`VecTask`: reset()/step(actions) → (obs_dict, rew, reset, extras),
obs_dict keys obs/priv_info/student_obs/tactile/img/seg/pcl/contacts —
factory_task_insertion.py:2126-2144) over the pure functional core. Use this
when integrating with external RL libraries; the in-repo trainers bypass it
and scan the functional step directly (zero host round-trips).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..assets import build_subassembly_set
from ..physics.robot import build_kuka_openhand
from . import insertion
from .config import TaskConfig, default_task_config


class InsertionVecEnv:
    """FactoryTaskInsertionTactile object API (one sim per instance)."""

    def __init__(self, cfg: TaskConfig | None = None, num_envs: int = 128,
                 seed: int = 0, grasp_data=None):
        self.cfg = cfg or default_task_config()
        self.num_envs = num_envs
        self.model = build_kuka_openhand()
        self.subs = build_subassembly_set()
        self.grasp_data = grasp_data
        self._rng = jax.random.PRNGKey(seed)
        self._step = jax.jit(
            lambda s, a: insertion.step(self.cfg, self.model, self.subs, s, a,
                                        grasp_data=self.grasp_data)
        )
        self.state = insertion.reset_all(self.cfg, self.model, self.subs,
                                         self._rng, num_envs, grasp_data=grasp_data)
        self._last_out: insertion.StepOutput | None = None

    # ---- reference Env ABC surface -------------------------------------
    @property
    def num_observations(self) -> int:
        return self.cfg.env.num_observations * self.cfg.env.num_obs_hist

    @property
    def num_actions(self) -> int:
        return self.cfg.env.num_actions

    @property
    def num_states(self) -> int:
        return self.cfg.env.num_states

    def reset(self) -> dict:
        self._rng, k = jax.random.split(self._rng)
        self.state = insertion.reset_all(self.cfg, self.model, self.subs, k,
                                         self.num_envs, grasp_data=self.grasp_data)
        obs = self.state.obs_queue
        priv = insertion.priv_info_of(self.cfg, self.model, self.state)
        return {
            "obs": obs,
            "priv_info": priv,
            "student_obs": self.state.obs_stud_queue,
            "tactile": self.state.tactile_queue,
            "img": self.state.img_queue,
            "seg": self.state.seg_queue,
            "pcl": self.state.pcl_queue,
            "contacts": self.state.contact_queue,
        }

    def step(self, actions) -> tuple[dict, jax.Array, jax.Array, dict]:
        self.state, out = self._step(self.state, jnp.asarray(actions))
        self._last_out = out
        obs_dict = {
            "obs": out.obs,
            "priv_info": out.priv_info,
            "student_obs": out.student_obs,
            "tactile": out.tactile,
            "img": out.img,
            "seg": out.seg,
            "pcl": out.pcl,
            "contacts": out.contacts,
        }
        return obs_dict, out.rew, out.reset, {"time_outs": out.timeout, **out.extras}


# task registry (tasks/__init__.py:38-43 parity)
def _make_insertion(cfg=None, num_envs=128, **kw):
    return InsertionVecEnv(cfg=cfg, num_envs=num_envs, **kw)


class GraspGenTask:
    """FactoryTaskGraspTactile equivalent: drives envs/grasp_gen.py."""

    def __init__(self, cfg=None, num_envs=128, **kw):
        self.cfg = cfg or default_task_config()
        self.num_envs = num_envs
        self.model = build_kuka_openhand()
        self.subs = build_subassembly_set()

    def run(self, n_rounds: int, out_path: str, **kw) -> int:
        from .grasp_gen import generate_grasp_dataset

        return generate_grasp_dataset(self.cfg, self.model, self.subs,
                                      self.num_envs, n_rounds, out_path, **kw)


class SysIdTask:
    """FactoryTaskOptimizeTactile equivalent: drives sysid.py TPE."""

    def __init__(self, cfg=None, num_envs=1, **kw):
        self.cfg = cfg or default_task_config()
        self.model = build_kuka_openhand()
        self.subs = build_subassembly_set()

    def run(self, recorded: dict, n_trials: int = 50, **kw):
        from ..sysid import optimize_sim_params

        return optimize_sim_params(self.cfg, self.model, self.subs, recorded,
                                   n_trials=n_trials, **kw)


task_map = {
    "FactoryTaskInsertionTactile": _make_insertion,
    "FactoryTaskGraspTactile": GraspGenTask,
    "FactoryTaskOptimizeTactile": SysIdTask,
}


def make(task_name: str, **kwargs):
    """isaacgyminsertion.make() parity."""
    if task_name not in task_map:
        raise KeyError(f"unknown task {task_name}; available: {list(task_map)}")
    return task_map[task_name](**kwargs)
