"""Functional running mean/std normalizer (parity: algo/models/running_mean_std.py).

The reference wraps a Welford-style running normalizer in an nn.Module with
train/eval modes; here it is an explicit state pytree + pure update/normalize
functions, so the update is part of the jitted train step and the state ships
inside checkpoints like any other pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RMSState(NamedTuple):
    mean: jax.Array
    var: jax.Array
    count: jax.Array  # scalar


def rms_init(shape, dtype=jnp.float32) -> RMSState:
    return RMSState(
        mean=jnp.zeros(shape, dtype),
        var=jnp.ones(shape, dtype),
        count=jnp.asarray(1e-4, dtype),
    )


def rms_update(state: RMSState, batch: jax.Array) -> RMSState:
    """Parallel-variance (Chan et al.) update over all leading axes."""
    reduce_axes = tuple(range(batch.ndim - state.mean.ndim))
    batch_mean = jnp.mean(batch, axis=reduce_axes)
    batch_var = jnp.var(batch, axis=reduce_axes)
    batch_count = jnp.asarray(
        jnp.prod(jnp.asarray(batch.shape[: batch.ndim - state.mean.ndim])), state.count.dtype
    )
    delta = batch_mean - state.mean
    tot = state.count + batch_count
    new_mean = state.mean + delta * batch_count / tot
    m_a = state.var * state.count
    m_b = batch_var * batch_count
    M2 = m_a + m_b + delta**2 * state.count * batch_count / tot
    return RMSState(mean=new_mean, var=M2 / tot, count=tot)


def rms_normalize(state: RMSState, x: jax.Array, clip: float = 5.0) -> jax.Array:
    y = (x - state.mean) / jnp.sqrt(state.var + 1e-5)
    return jnp.clip(y, -clip, clip)


def rms_unnormalize(state: RMSState, y: jax.Array) -> jax.Array:
    return y * jnp.sqrt(state.var + 1e-5) + state.mean
