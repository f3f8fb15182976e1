"""Domain-randomization noise engine (parity: vec_task.py:664-748).

The reference builds per-parameter `noise_lambda` closures with:
  - a white component resampled every application,
  - a *correlated* component sampled once per randomization window
    (`randomization_params.frequency`, 499 = once per episode) and held,
  - linear/constant schedule scaling of the ranges by the global step count,
  - additive or scaling composition, gaussian or uniform distributions.

Here the same semantics are pure functions of (spec, rng, corr, global_step):
the correlated sample is state carried in EnvState and refreshed by the reset
path (the reference's own config ties the refresh window to the episode:
frequency 499 vs max_episode_length 500), and schedule scaling is computed
from the in-graph `global_step` counter instead of `gym.get_frame_count`.

Gravity randomization (vec_task.py:736-748: sim_params.gravity additive
gaussian, range [0, 0.4]) is applied to the per-env `PhysicsParams.gravity`
scalar on the same refresh schedule.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class NoiseSpec:
    """One randomization_params entry (observations / actions / gravity)."""

    range: tuple = (0.0, 0.0)             # (mu, var) gaussian | (lo, hi) uniform
    range_correlated: tuple = (0.0, 0.0)  # correlated component ranges
    operation: str = "additive"           # "additive" | "scaling"
    distribution: str = "gaussian"        # "gaussian" | "uniform"
    schedule: str | None = None           # None | "linear" | "constant"
    schedule_steps: int = 40_000


def schedule_scaling(spec: NoiseSpec, global_step: jax.Array) -> jax.Array:
    """sched_scaling per vec_task.py:671-677 (1.0 when no schedule)."""
    gs = global_step.astype(jnp.float32)
    if spec.schedule == "linear":
        return jnp.minimum(gs, float(spec.schedule_steps)) / float(spec.schedule_steps)
    if spec.schedule == "constant":
        return (gs >= float(spec.schedule_steps)).astype(jnp.float32)
    return jnp.ones(())


def _scheduled_params(spec: NoiseSpec, sched: jax.Array):
    """Scale (a, b, a_corr, b_corr) by the schedule per vec_task.py:684-727.

    additive: all four scale linearly toward zero-noise at step 0.
    scaling:  second moment scales toward 0, first toward 1 (identity op).

    Conscious deviation: the reference interpolates BOTH the white mean and
    the correlated mean toward 1 under a scaling schedule (vec_task.py:692-697),
    which makes the combined multiplier 2 (not identity) at step 0 — latent
    there because every schedule in the shipped yaml is commented out. Here
    the correlated component interpolates toward 0 so the total operation is
    exactly identity at schedule start.
    """
    a, b = float(spec.range[0]), float(spec.range[1])
    ac, bc = float(spec.range_correlated[0]), float(spec.range_correlated[1])
    if spec.operation == "additive":
        return a * sched, b * sched, ac * sched, bc * sched
    # scaling: white component → identity (gaussian: mu→1, var→0;
    # uniform: lo,hi→1), correlated component → 0
    if spec.distribution == "gaussian":
        return a * sched + (1.0 - sched), b * sched, ac * sched, bc * sched
    return (a * sched + (1.0 - sched), b * sched + (1.0 - sched),
            ac * sched, bc * sched)


def sample_correlated(spec: NoiseSpec, key: jax.Array, shape) -> jax.Array:
    """Draw the raw correlated sample held for a randomization window.

    The reference stores a standard normal/uniform draw (`params['corr']`)
    and rescales it by the *current* scheduled ranges at every application —
    reproduced by keeping the raw draw in state and scaling in apply_noise.
    """
    if spec.distribution == "uniform":
        return jax.random.uniform(key, shape)
    return jax.random.normal(key, shape)


def apply_noise(
    spec: NoiseSpec,
    key: jax.Array,
    corr_raw: jax.Array,
    tensor: jax.Array,
    global_step: jax.Array,
) -> jax.Array:
    """noise_lambda parity (vec_task.py:699-736): correlated + white noise."""
    sched = schedule_scaling(spec, global_step)
    a, b, ac, bc = _scheduled_params(spec, sched)
    if spec.distribution == "gaussian":
        corr = corr_raw * bc + ac
        white = jax.random.normal(key, tensor.shape) * b + a
    else:
        corr = corr_raw * (bc - ac) + ac
        white = jax.random.uniform(key, tensor.shape) * (b - a) + a
    noise = corr + white
    if spec.operation == "additive":
        return tensor + noise
    return tensor * noise
