"""Conditional diffusion policy over action chunks (flax).

Parity: algo/models/diffusion/* (SURVEY.md §2.3): UNet-1D conditional noise
predictor over action sequences, DDPM training with EMA weights, DDIM
sampling for fast eval, observation-conditioned via FiLM. The reference
vendors diffusers-style components; this is a from-scratch flax
implementation of the same method (Chi et al., "Diffusion Policy").
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class FiLMResBlock1D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, cond):  # x: [B, T, C], cond: [B, D]
        h = nn.Conv(self.channels, (3,))(x)
        h = nn.GroupNorm(num_groups=min(8, self.channels))(h)
        scale_shift = nn.Dense(2 * self.channels)(nn.silu(cond))
        scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
        h = nn.silu(h * (1.0 + scale) + shift)
        h = nn.Conv(self.channels, (3,))(h)
        h = nn.GroupNorm(num_groups=min(8, self.channels))(h)
        res = nn.Conv(self.channels, (1,))(x) if x.shape[-1] != self.channels else x
        return nn.silu(h) + res


class UNet1D(nn.Module):
    """Down/up 1D UNet noise predictor ε_θ(x_t, t, obs)."""

    act_dim: int = 6
    base_channels: int = 64
    channel_mults: Sequence[int] = (1, 2)
    cond_dim: int = 128

    @nn.compact
    def __call__(self, x, t, obs_cond):  # x: [B, T, A]
        temb = nn.Dense(self.cond_dim)(nn.silu(nn.Dense(self.cond_dim)(
            timestep_embedding(t, self.cond_dim))))
        cond = temb + nn.Dense(self.cond_dim)(obs_cond)

        hs = []
        h = nn.Conv(self.base_channels, (3,))(x)
        for mult in self.channel_mults:
            ch = self.base_channels * mult
            h = FiLMResBlock1D(ch)(h, cond)
            hs.append(h)
            h = nn.avg_pool(h, (2,), strides=(2,))
        h = FiLMResBlock1D(self.base_channels * self.channel_mults[-1])(h, cond)
        for mult in reversed(self.channel_mults):
            ch = self.base_channels * mult
            b, t_len, c = h.shape
            h = jax.image.resize(h, (b, t_len * 2, c), "nearest")
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            h = FiLMResBlock1D(ch)(h, cond)
        return nn.Conv(self.act_dim, (3,))(h)


def make_beta_schedule(num_steps: int = 100, beta_start: float = 1e-4,
                       beta_end: float = 0.02):
    betas = jnp.linspace(beta_start, beta_end, num_steps)
    alphas = 1.0 - betas
    alpha_bar = jnp.cumprod(alphas)
    return betas, alphas, alpha_bar


class DiffusionPolicy:
    """DDPM train / DDIM sample wrapper (diffusion_policy.py:41-434 parity)."""

    def __init__(self, act_dim: int = 6, chunk: int = 8, obs_dim: int = 15,
                 num_diffusion_steps: int = 100, ema_decay: float = 0.995):
        self.net = UNet1D(act_dim=act_dim)
        self.act_dim, self.chunk, self.obs_dim = act_dim, chunk, obs_dim
        self.num_steps = num_diffusion_steps
        self.ema_decay = ema_decay
        self.betas, self.alphas, self.alpha_bar = make_beta_schedule(num_diffusion_steps)

    def init(self, rng):
        x = jnp.zeros((1, self.chunk, self.act_dim))
        return self.net.init(rng, x, jnp.zeros((1,), jnp.int32), jnp.zeros((1, self.obs_dim)))

    def loss(self, params, rng, actions, obs_cond):
        """ε-prediction MSE at a uniformly sampled diffusion step."""
        b = actions.shape[0]
        k1, k2 = jax.random.split(rng)
        t = jax.random.randint(k1, (b,), 0, self.num_steps)
        eps = jax.random.normal(k2, actions.shape)
        ab = self.alpha_bar[t][:, None, None]
        x_t = jnp.sqrt(ab) * actions + jnp.sqrt(1.0 - ab) * eps
        pred = self.net.apply(params, x_t, t, obs_cond)
        return jnp.mean(jnp.square(pred - eps))

    def ema_update(self, ema_params, params):
        return jax.tree_util.tree_map(
            lambda e, p: self.ema_decay * e + (1.0 - self.ema_decay) * p, ema_params, params
        )

    def sample_ddim(self, params, rng, obs_cond, num_inference_steps: int = 8,
                    eta: float = 0.0):
        """DDIM sampler (eval path parity)."""
        b = obs_cond.shape[0]
        step_idx = jnp.linspace(self.num_steps - 1, 0, num_inference_steps).astype(jnp.int32)
        x = jax.random.normal(rng, (b, self.chunk, self.act_dim))

        def body(x, i):
            t = step_idx[i]
            t_prev = jnp.where(i + 1 < num_inference_steps, step_idx[jnp.minimum(i + 1, num_inference_steps - 1)], -1)
            ab_t = self.alpha_bar[t]
            ab_prev = jnp.where(t_prev >= 0, self.alpha_bar[jnp.maximum(t_prev, 0)], 1.0)
            eps = self.net.apply(params, x, jnp.full((b,), t), obs_cond)
            x0 = (x - jnp.sqrt(1.0 - ab_t) * eps) / jnp.sqrt(ab_t)
            x0 = jnp.clip(x0, -1.0, 1.0)
            x_new = jnp.sqrt(ab_prev) * x0 + jnp.sqrt(1.0 - ab_prev) * eps
            return x_new, None

        x, _ = jax.lax.scan(body, x, jnp.arange(num_inference_steps))
        return x
