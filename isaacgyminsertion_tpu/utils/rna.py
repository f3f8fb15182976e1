"""RandomNetworkAdversary — random-net action perturbation DR (flax).

Parity: utils/rna_util.py:37-163 (from DeXtreme): a frozen randomly-initialized
MLP maps (obs, noise) → per-dim action perturbations, re-drawn periodically.
Available but not wired into the insertion task by default (same status as
the reference)."""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _RNANet(nn.Module):
    num_actions: int = 6
    hidden: int = 128

    @nn.compact
    def __call__(self, obs, z):
        x = jnp.concatenate([obs, z], axis=-1)
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return jnp.tanh(nn.Dense(self.num_actions)(x))


class RandomNetworkAdversary:
    def __init__(self, obs_dim: int, num_actions: int = 6, scale: float = 0.05,
                 seed: int = 0):
        self.net = _RNANet(num_actions=num_actions)
        self.scale = scale
        self.obs_dim = obs_dim
        self.params = self.net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, obs_dim)), jnp.zeros((1, 8))
        )

    def refresh(self, key):
        """Re-draw the adversary weights (periodic re-randomization)."""
        self.params = self.net.init(key, jnp.zeros((1, self.obs_dim)), jnp.zeros((1, 8)))

    def perturb(self, key, obs, actions):
        z = jax.random.normal(key, obs.shape[:-1] + (8,))
        delta = self.net.apply(self.params, obs, z)
        return jnp.clip(actions + self.scale * delta, -1.0, 1.0)
