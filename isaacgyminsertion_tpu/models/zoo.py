"""Auxiliary model zoo (flax) — parity with algo/models/** (SURVEY.md §2.3).

Compact from-scratch implementations of every aux family the reference ships:
  - ActorCritic (legacy combined variant, models.py:70) + AdaptTConv 1D-conv
    force/torque-history encoder (models.py:41)
  - TactileTransformer (transformer/model.py:7) and TCN (transformer/tcn.py)
  - PointMAE masked pointnet autoencoder (transformer/point_mae.py:24-181)
  - tactile ResNet encoder (convnets/resnets.py) and tactile VAE
    (algo/models/vae/)
  - CycleGAN generator/discriminator + LSGAN loss (sim2real path,
    allsight/experiments/models/networks.py:139-182 define_G/define_D)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .actor_critic import MLP


class AdaptTConv(nn.Module):
    """1D-conv force/torque-history encoder (models.py:41)."""

    ft_dim: int = 6
    out_dim: int = 8

    @nn.compact
    def __call__(self, ft_hist):  # [B, T, ft_dim]
        x = ft_hist
        for feat, k, s in ((32, 9, 2), (32, 5, 1), (32, 5, 1)):
            x = nn.relu(nn.Conv(feat, (k,), strides=(s,))(x))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.out_dim)(x)


class ActorCritic(nn.Module):
    """Legacy combined actor-critic (models.py:70) with optional FT encoder."""

    num_actions: int = 6
    obs_dim: int = 15
    units: Sequence[int] = (512, 256, 128)
    use_ft: bool = False

    @nn.compact
    def __call__(self, obs, ft_hist=None):
        z = obs
        if self.use_ft and ft_hist is not None:
            z = jnp.concatenate([z, AdaptTConv()(ft_hist)], axis=-1)
        h = MLP(self.units)(z)
        mu = nn.Dense(self.num_actions)(h)
        value = nn.Dense(1)(h)[..., 0]
        log_std = self.param("log_std", nn.initializers.zeros, (self.num_actions,))
        return mu, log_std, value


class TemporalBlock(nn.Module):
    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x):  # [B, T, C] causal
        pad = 2 * self.dilation
        h = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
        h = nn.relu(nn.Conv(self.channels, (3,), kernel_dilation=(self.dilation,),
                            padding="VALID")(h))
        res = nn.Dense(self.channels)(x) if x.shape[-1] != self.channels else x
        return h + res


class TCN(nn.Module):
    """Temporal convolutional net (transformer/tcn.py)."""

    channels: Sequence[int] = (64, 64, 64)
    out_dim: int = 8

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        for i, c in enumerate(self.channels):
            x = TemporalBlock(c, dilation=2**i)(x)
        return nn.Dense(self.out_dim)(x[:, -1])


class TactileTransformer(nn.Module):
    """Sequence transformer over per-step embeddings (transformer/model.py:7)."""

    embed_dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    out_dim: int = 8

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        h = nn.Dense(self.embed_dim)(x)
        pos = self.param("pos", nn.initializers.normal(0.02), (1, x.shape[1], self.embed_dim))
        h = h + pos
        for _ in range(self.num_layers):
            a = nn.SelfAttention(num_heads=self.num_heads)(h)
            h = nn.LayerNorm()(h + a)
            f = nn.Dense(self.embed_dim)(nn.gelu(nn.Dense(4 * self.embed_dim)(h)))
            h = nn.LayerNorm()(h + f)
        return nn.Dense(self.out_dim)(h[:, -1])


class PointMAE(nn.Module):
    """Masked pointnet autoencoder (transformer/point_mae.py:24-181): encode a
    random subset of points, reconstruct the full cloud (Chamfer target)."""

    embed_dim: int = 128
    num_out_points: int = 128

    @nn.compact
    def __call__(self, pts, mask):  # pts [B, P, 3], mask [B, P] 1=visible
        x = nn.relu(nn.Dense(64)(pts))
        x = nn.relu(nn.Dense(self.embed_dim)(x))
        x = jnp.where(mask[..., None] > 0, x, -1e30)
        feat = jnp.max(x, axis=-2)  # masked max-pool
        h = nn.relu(nn.Dense(self.embed_dim)(feat))
        out = nn.Dense(self.num_out_points * 3)(h)
        return out.reshape(out.shape[0], self.num_out_points, 3), feat


def chamfer_distance(a: jax.Array, b: jax.Array) -> jax.Array:
    """Symmetric Chamfer distance between point sets [B, P, 3] / [B, Q, 3]."""
    d = jnp.sum(jnp.square(a[:, :, None] - b[:, None, :]), axis=-1)
    return jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))


class TactileResNetBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.GroupNorm(8)(nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2)(x)))
        h = nn.GroupNorm(8)(nn.Conv(self.channels, (3, 3))(h))
        if x.shape[-1] != self.channels or self.stride != 1:
            x = nn.Conv(self.channels, (1, 1), strides=(self.stride,) * 2)(x)
        return nn.relu(h + x)


class TactileResNet(nn.Module):
    """Small ResNet tactile encoder (convnets/resnets.py parity; GroupNorm like
    the reference's EfficientNet GroupNorm swap)."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        h = nn.relu(nn.Conv(32, (7, 7), strides=(2, 2))(x))
        for c, s in ((32, 1), (64, 2), (128, 2)):
            h = TactileResNetBlock(c, s)(h)
        h = jnp.mean(h, axis=(1, 2))
        return nn.Dense(self.out_dim)(h)


class TactileVAE(nn.Module):
    """Conv VAE over tactile frames (algo/models/vae parity)."""

    latent_dim: int = 32

    def setup(self):
        self.enc1 = nn.Conv(32, (4, 4), strides=(2, 2))
        self.enc2 = nn.Conv(64, (4, 4), strides=(2, 2))
        self.enc3 = nn.Conv(128, (4, 4), strides=(2, 2))
        self.fc_mu = nn.Dense(self.latent_dim)
        self.fc_logvar = nn.Dense(self.latent_dim)
        self.dec_fc = nn.Dense(8 * 8 * 128)
        self.dec1 = nn.ConvTranspose(64, (4, 4), strides=(2, 2))
        self.dec2 = nn.ConvTranspose(32, (4, 4), strides=(2, 2))
        self.dec3 = nn.ConvTranspose(3, (4, 4), strides=(2, 2))

    def encode(self, x):
        h = nn.relu(self.enc1(x))
        h = nn.relu(self.enc2(h))
        h = nn.relu(self.enc3(h))
        h = h.reshape(h.shape[0], -1)
        return self.fc_mu(h), self.fc_logvar(h)

    def decode(self, z):
        h = nn.relu(self.dec_fc(z)).reshape(z.shape[0], 8, 8, 128)
        h = nn.relu(self.dec1(h))
        h = nn.relu(self.dec2(h))
        return nn.sigmoid(self.dec3(h))

    def __call__(self, x, rng):
        mu, logvar = self.encode(x)
        eps = jax.random.normal(rng, mu.shape)
        z = mu + jnp.exp(0.5 * logvar) * eps
        recon = self.decode(z)
        return recon, mu, logvar


# ------------------------------------------------------------ CycleGAN (sim2real)


class ResnetGenerator(nn.Module):
    """define_G parity (networks.py:139-182): resnet-style image translator."""

    base: int = 32
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c_in = x.shape[-1]
        h = nn.relu(nn.GroupNorm(8)(nn.Conv(self.base, (7, 7))(x)))
        h = nn.relu(nn.GroupNorm(8)(nn.Conv(self.base * 2, (3, 3), strides=(2, 2))(h)))
        for _ in range(self.n_blocks):
            r = nn.relu(nn.GroupNorm(8)(nn.Conv(self.base * 2, (3, 3))(h)))
            r = nn.GroupNorm(8)(nn.Conv(self.base * 2, (3, 3))(r))
            h = h + r
        h = nn.relu(nn.GroupNorm(8)(nn.ConvTranspose(self.base, (3, 3), strides=(2, 2))(h)))
        return nn.tanh(nn.Conv(c_in, (7, 7))(h))


class PatchDiscriminator(nn.Module):
    """define_D parity: 70×70 PatchGAN."""

    base: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(nn.Conv(self.base, (4, 4), strides=(2, 2))(x), 0.2)
        h = nn.leaky_relu(nn.GroupNorm(8)(nn.Conv(self.base * 2, (4, 4), strides=(2, 2))(h)), 0.2)
        h = nn.leaky_relu(nn.GroupNorm(8)(nn.Conv(self.base * 4, (4, 4), strides=(2, 2))(h)), 0.2)
        return nn.Conv(1, (4, 4))(h)


def lsgan_loss(pred: jax.Array, is_real: bool) -> jax.Array:
    """GANLoss('lsgan') parity."""
    target = 1.0 if is_real else 0.0
    return jnp.mean(jnp.square(pred - target))
