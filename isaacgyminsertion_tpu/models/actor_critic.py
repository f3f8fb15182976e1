"""Asymmetric actor-critic with privileged-info encoder (flax).

Parity target: algo/models/models_split.py (`ActorCriticSplit`,
models_split.py:56-251): priv-MLP 64→[256,128,8] latent, optional contact
autoencoder 400→8, actor/critic MLPs [512,256,128] over obs ⊕ latent,
state-independent learned log-std (models_split.py:106). All dense math lands
on the MXU as batched matmuls; bfloat16-friendly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLP(nn.Module):
    units: Sequence[int]
    activate_last: bool = True

    @nn.compact
    def __call__(self, x):
        for i, u in enumerate(self.units):
            x = nn.Dense(u)(x)
            if self.activate_last or i < len(self.units) - 1:
                x = nn.elu(x)
        return x


class ContactAE(nn.Module):
    """Extrinsic-contact autoencoder (models_split.py:41-53): 400 → 8 → 400."""

    latent_dim: int = 8
    contact_dim: int = 400

    @nn.compact
    def __call__(self, contacts):
        z = self.encode(contacts)
        recon = self.decode(z)
        return z, recon

    def encode(self, contacts):
        return MLP([128, 64, self.latent_dim], activate_last=False, name="enc")(contacts)

    def decode(self, z):
        h = MLP([64, 128], name="dec_h")(z)
        return nn.sigmoid(nn.Dense(self.contact_dim, name="dec_out")(h))


class ActorCriticSplit(nn.Module):
    num_actions: int = 6
    obs_dim: int = 15
    priv_dim: int = 64
    priv_units: Sequence[int] = (256, 128, 8)
    units: Sequence[int] = (512, 256, 128)
    use_contact_ae: bool = False
    contact_dim: int = 400

    def setup(self):
        self.priv_mlp = MLP(self.priv_units, name="priv_mlp")
        self.actor_mlp = MLP(self.units, name="actor_mlp")
        self.critic_mlp = MLP(self.units, name="critic_mlp")
        self.mu_head = nn.Dense(self.num_actions, name="mu")
        self.value_head = nn.Dense(1, name="value")
        self.log_std = self.param(
            "log_std", nn.initializers.zeros, (self.num_actions,)
        )
        if self.use_contact_ae:
            self.contact_ae = ContactAE(name="contact_ae")

    def latent(self, priv_info):
        return self.priv_mlp(priv_info)

    def __call__(self, obs, priv_info, latent=None, contacts=None):
        """Returns (mu, log_std, value, latent_gt[, contact_recon]).

        `latent` overrides the priv encoder output (student latent injection,
        models_split.py:154-199 act_inference).
        """
        latent_gt = self.priv_mlp(priv_info)
        z = latent_gt if latent is None else latent
        extras = {}
        if self.use_contact_ae and contacts is not None:
            cz, recon = self.contact_ae(contacts)
            z = jnp.concatenate([z, cz], axis=-1)
            extras["contact_recon"] = recon
        x = jnp.concatenate([obs, z], axis=-1)
        mu = self.mu_head(self.actor_mlp(x))
        value = self.value_head(self.critic_mlp(x))[..., 0]
        return mu, self.log_std, value, latent_gt, extras


def sample_actions(mu, log_std, key):
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    actions = mu + std * eps
    neglogp = gaussian_neglogp(actions, mu, log_std)
    return actions, neglogp


def gaussian_neglogp(actions, mu, log_std):
    std = jnp.exp(log_std)
    return 0.5 * jnp.sum(jnp.square((actions - mu) / std), axis=-1) + jnp.sum(
        log_std
    ) + 0.5 * actions.shape[-1] * jnp.log(2.0 * jnp.pi)


def policy_kl(mu0, sigma0, mu1, sigma1):
    """Analytic diagonal-gaussian KL (frozen_ppo.py:854-861 parity)."""
    c1 = jnp.log(sigma1 / sigma0 + 1e-5)
    c2 = (sigma0**2 + (mu1 - mu0) ** 2) / (2.0 * sigma1**2 + 1e-5)
    return jnp.mean(jnp.sum(c1 + c2 - 0.5, axis=-1))
