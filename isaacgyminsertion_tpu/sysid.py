"""Sim-parameter system identification (parity: factory_task_optimize.py).

The reference fits sim params to recorded real trajectories with hyperopt TPE
(`objective()` factory_task_optimize.py:669, SURVEY.md §2.1). hyperopt is not
in this image, so this module ships a self-contained numpy TPE (the standard
good/bad-split kernel-density estimator of Bergstra et al.) driving the
jitted physics engine: each trial sets per-env physics params (friction,
contact stiffness proxies, PD-gain scales), replays the recorded action
stream through `insertion.step`, and scores plug-pose tracking error. All
trials in one TPE batch run as extra env rows — the sweep is vectorized over
the env axis instead of sequential processes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- numpy TPE


@dataclass
class Uniform:
    lo: float
    hi: float

    def sample(self, rng, n=1):
        return rng.uniform(self.lo, self.hi, size=n)


def tpe_suggest(space: dict[str, Uniform], history: list[tuple[dict, float]],
                rng: np.random.Generator, gamma: float = 0.25,
                n_candidates: int = 24) -> dict:
    """One TPE suggestion: maximize l(x)/g(x) from the good/bad KDE split."""
    if len(history) < 8:
        return {k: float(v.sample(rng)[0]) for k, v in space.items()}
    srt = sorted(history, key=lambda h: h[1])
    n_good = max(int(gamma * len(srt)), 2)
    good = srt[:n_good]
    bad = srt[n_good:]

    def kde_logpdf(samples: np.ndarray, x: np.ndarray, lo: float, hi: float):
        bw = max(0.5 * (hi - lo) / max(len(samples), 1) ** 0.5, 1e-8)
        d = (x[:, None] - samples[None, :]) / bw
        return np.log(np.mean(np.exp(-0.5 * d * d), axis=1) / (bw * np.sqrt(2 * np.pi)) + 1e-12)

    out = {}
    for k, dist in space.items():
        g_s = np.asarray([h[0][k] for h in good])
        b_s = np.asarray([h[0][k] for h in bad]) if bad else g_s
        # candidates drawn from the good KDE
        cands = np.clip(
            g_s[rng.integers(0, len(g_s), n_candidates)]
            + rng.normal(0, 0.1 * (dist.hi - dist.lo), n_candidates),
            dist.lo, dist.hi,
        )
        score = kde_logpdf(g_s, cands, dist.lo, dist.hi) - kde_logpdf(b_s, cands, dist.lo, dist.hi)
        out[k] = float(cands[np.argmax(score)])
    return out


def tpe_minimize(objective: Callable[[dict], float], space: dict[str, Uniform],
                 n_trials: int = 50, seed: int = 0):
    """hyperopt.fmin(tpe.suggest) equivalent; returns (best_params, history)."""
    rng = np.random.default_rng(seed)
    history: list[tuple[dict, float]] = []
    for _ in range(n_trials):
        params = tpe_suggest(space, history, rng)
        loss = float(objective(params))
        history.append((params, loss))
    best = min(history, key=lambda h: h[1])
    return best[0], history


# ------------------------------------------------------- sim-param objective

DEFAULT_SPACE = {
    "mu_scale": Uniform(0.5, 2.0),        # friction pair scaling
    "kp_scale": Uniform(0.5, 2.0),        # arm PD stiffness scale
    "kd_scale": Uniform(0.5, 2.0),
    "mass_scale": Uniform(0.5, 1.5),      # plug mass
}


def make_replay_objective(cfg_task, model, subs, recorded: dict, n_envs: int = 1):
    """Objective: replay recorded actions, compare plug trajectories.

    `recorded`: dict with 'actions' [T, 6], 'plug_pos' [T, 3], 'plug_quat'
    [T, 4] (one reference trajectory, e.g. from the data logger or hardware).
    """
    from .envs import insertion

    T = recorded["actions"].shape[0]
    actions = jnp.asarray(np.tile(recorded["actions"][:, None], (1, n_envs, 1)))
    target_pos = jnp.asarray(recorded["plug_pos"])
    target_quat = jnp.asarray(recorded["plug_quat"])

    def rollout(env_state):
        def body(env_state, act):
            env_state, _ = insertion.step(cfg_task, model, subs, env_state, act)
            return env_state, (env_state.phys.plug_pos, env_state.phys.plug_quat)

        env_state, (pos, quat) = jax.lax.scan(body, env_state, actions)
        pos_err = jnp.mean(jnp.sum(jnp.square(pos[:, 0] - target_pos), axis=-1))
        quat_err = jnp.mean(1.0 - jnp.abs(jnp.sum(quat[:, 0] * target_quat, axis=-1)))
        return pos_err + 0.1 * quat_err

    rollout_jit = jax.jit(rollout)

    def objective(trial_params: dict) -> float:
        env_state = insertion.reset_all(cfg_task, model, subs, jax.random.PRNGKey(0), n_envs)
        p = env_state.params
        c = p.contact
        p = p._replace(
            plug_mass=p.plug_mass * trial_params.get("mass_scale", 1.0),
            kp=p.kp * trial_params.get("kp_scale", 1.0),
            kd=p.kd * trial_params.get("kd_scale", 1.0),
            contact=c._replace(
                mu_socket=c.mu_socket * trial_params.get("mu_scale", 1.0),
                mu_table=c.mu_table * trial_params.get("mu_scale", 1.0),
                mu_finger=c.mu_finger * trial_params.get("mu_scale", 1.0),
            ),
        )
        env_state = env_state._replace(params=p)
        return float(rollout_jit(env_state))

    return objective


def optimize_sim_params(cfg_task, model, subs, recorded: dict,
                        space: dict | None = None, n_trials: int = 50, seed: int = 0):
    """FactoryTaskOptimizeTactile.objective() driver parity."""
    obj = make_replay_objective(cfg_task, model, subs, recorded)
    return tpe_minimize(obj, space or DEFAULT_SPACE, n_trials=n_trials, seed=seed)
