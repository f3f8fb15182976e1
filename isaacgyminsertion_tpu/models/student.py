"""Student multi-modal model (flax) — token-per-modality transformer.

Parity target: algo/models/transformer/tact.py `MultiModalModel` (tact.py:
214-552) and its encoders:
  - tactile: 3-finger stacked CNN with spatial soft-argmax
    (tactile_cnn.py:62 `CNNWithSpatialSoftArgmax`)
  - depth/seg: `DepthOnlyFCBackbone54x96` conv stack (tact.py:81-113)
  - linear obs: MLP encoder
  - point clouds: per-object `PointNet` encoders (plug/socket/goal/scene,
    pointnets.py:12-43) + compressor (tact.py:343-370) with POSITIONAL
    slicing of the merged cloud (hard contract, SURVEY.md §8.3)
  - token fusion: `MultiLayerDecoder` = self-attention transformer encoder +
    positional encoding + MLP head [256,128,64,32] (tact.py:115-159)
  - output: latent 8 (student RMA latent) or 6-dim tanh action (BC mode)

TPU notes: convs/attention are MXU work; everything is batch-major and
bfloat16-safe. Sequence length = context_size × num_modality_tokens (tiny),
so attention cost is negligible — the design point is parity, not scale.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .actor_critic import MLP


class SpatialSoftArgmax(nn.Module):
    """Expected pixel coordinates per channel (tactile_cnn.py spatial head)."""

    temperature: float = 1.0

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        pos_y, pos_x = jnp.meshgrid(
            jnp.linspace(-1.0, 1.0, h), jnp.linspace(-1.0, 1.0, w), indexing="ij"
        )
        logits = x.reshape(b, h * w, c) / self.temperature
        attn = jax.nn.softmax(logits, axis=1)
        ex = jnp.sum(attn * pos_x.reshape(1, h * w, 1), axis=1)
        ey = jnp.sum(attn * pos_y.reshape(1, h * w, 1), axis=1)
        return jnp.concatenate([ex, ey], axis=-1)  # [B, 2C]


class TactileCNN(nn.Module):
    """Per-finger CNN + spatial soft-argmax; fingers stacked as channels."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, x):  # [B, F, H, W, C]
        b, f, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, f * c)
        for feat in (32, 64, 64):
            x = nn.Conv(feat, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
        kp = SpatialSoftArgmax()(x)               # [B, 128]
        return nn.Dense(self.out_dim)(kp)


class MBConv(nn.Module):
    """Mobile inverted bottleneck block (EfficientNet-b0 building block with
    the reference's GroupNorm swap — tact.py EfficientNet GroupNorm variant)."""

    out_ch: int
    stride: int = 1
    expand: int = 4

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.Conv(in_ch * self.expand, (1, 1), use_bias=False)(x)
        h = nn.silu(nn.GroupNorm(num_groups=min(8, in_ch * self.expand))(h))
        h = nn.Conv(in_ch * self.expand, (3, 3), strides=(self.stride,) * 2,
                    feature_group_count=in_ch * self.expand, use_bias=False)(h)
        h = nn.silu(nn.GroupNorm(num_groups=min(8, in_ch * self.expand))(h))
        # squeeze-excite
        se = jnp.mean(h, axis=(1, 2), keepdims=True)
        se = nn.silu(nn.Dense(max(in_ch // 4, 4))(se))
        se = nn.sigmoid(nn.Dense(h.shape[-1])(se))
        h = h * se
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = nn.GroupNorm(num_groups=min(8, self.out_ch))(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientTactileEncoder(nn.Module):
    """EfficientNet-b0-style tactile encoder (reference alternative to the
    spatial-softargmax CNN, tact.py encoder flag)."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, x):  # [B, F, H, W, C]
        b, f, h, w, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b, h, w, f * c)
        h_ = nn.silu(nn.GroupNorm(4)(nn.Conv(16, (3, 3), strides=(2, 2), use_bias=False)(x)))
        for ch, st in ((24, 2), (40, 2), (80, 2)):
            h_ = MBConv(ch, stride=st)(h_)
            h_ = MBConv(ch, stride=1)(h_)
        h_ = jnp.mean(h_, axis=(1, 2))
        return nn.Dense(self.out_dim)(h_)


class DepthCNN(nn.Module):
    """DepthOnlyFCBackbone54x96-style conv encoder for depth/seg images."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, x):  # [B, H, W] or [B, H, W, C]
        if x.ndim == 3:
            x = x[..., None]
        for feat, st in ((32, 2), (64, 2), (64, 2), (128, 2)):
            x = nn.Conv(feat, (3, 3), strides=(st, st))(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.out_dim)(x))


class PointNet(nn.Module):
    """Shared-MLP max-pool PointNet (pointnets.py:12-43)."""

    out_dim: int = 64

    @nn.compact
    def __call__(self, pts):  # [B, P, 3]
        x = pts
        for feat in (64, 128, self.out_dim):
            x = nn.Dense(feat)(x)
            x = nn.relu(x)
        return jnp.max(x, axis=-2)  # [B, out_dim]


class MultiLayerDecoder(nn.Module):
    """Self-attention token fusion + MLP head (tact.py:115-159)."""

    embed_dim: int = 64
    num_heads: int = 4
    num_layers: int = 2
    head_units: Sequence[int] = (256, 128, 64, 32)

    @nn.compact
    def __call__(self, tokens):  # [B, T, E]
        b, t, e = tokens.shape
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, t, e))
        x = tokens + pos
        for _ in range(self.num_layers):
            attn = nn.SelfAttention(num_heads=self.num_heads)(x)
            x = nn.LayerNorm()(x + attn)
            ff = nn.Dense(4 * e)(x)
            ff = nn.Dense(e)(nn.gelu(ff))
            x = nn.LayerNorm()(x + ff)
        x = x.reshape(b, t * e)
        return MLP(self.head_units)(x)


class MultiModalModel(nn.Module):
    """Student: modality encoders → tokens → transformer → latent/action."""

    use_obs: bool = True
    use_tactile: bool = False
    use_img: bool = False
    use_seg: bool = False
    use_pcl: bool = False
    tactile_encoder: str = "cnn"   # "cnn" (spatial softargmax) | "efficientnet"
    embed_dim: int = 64
    latent_dim: int = 8        # 8 (RMA latent) | 6 (only-BC action head)
    bc_mode: bool = False      # tanh action output (only_bc, ext_adapt.py)
    num_points: int = 400      # pcl slice sizes (runner.py:86-95)
    num_points_socket: int = 400
    num_points_goal: int = 400

    @nn.compact
    def __call__(self, obs=None, tactile=None, img=None, seg=None, pcl=None):
        tokens = []
        E = self.embed_dim
        if self.use_obs and obs is not None:
            tokens.append(MLP([128, E], name="obs_enc")(obs))
        if self.use_tactile and tactile is not None:
            # [B, T, F, H, W, C] → per-history-frame token
            b, t = tactile.shape[:2]
            enc_cls = (EfficientTactileEncoder if self.tactile_encoder == "efficientnet"
                       else TactileCNN)
            enc = enc_cls(out_dim=E, name="tactile_enc")
            for i in range(t):
                tokens.append(enc(tactile[:, i]))
        if self.use_img and img is not None:
            b, t = img.shape[:2]
            enc = DepthCNN(out_dim=E, name="img_enc")
            for i in range(t):
                tokens.append(enc(img[:, i]))
        if self.use_seg and seg is not None:
            b, t = seg.shape[:2]
            enc = DepthCNN(out_dim=E, name="seg_enc")
            for i in range(t):
                tokens.append(enc(seg[:, i]))
        if self.use_pcl and pcl is not None:
            # positional slices [plug | socket | goal | scene] (SURVEY.md §8.3)
            p = pcl[:, -1] if pcl.ndim == 4 else pcl
            ofs = 0
            feats = []
            for name, count in (
                ("plug", self.num_points),
                ("socket", self.num_points_socket),
                ("goal", self.num_points_goal),
            ):
                if count > 0 and ofs + count <= p.shape[1]:
                    feats.append(PointNet(out_dim=E, name=f"pn_{name}")(p[:, ofs:ofs + count]))
                    ofs += count
            if p.shape[1] > ofs:
                feats.append(PointNet(out_dim=E, name="pn_scene")(p[:, ofs:]))
            x = jnp.concatenate(feats, axis=-1)
            tokens.append(nn.Dense(E, name="pcl_compressor")(x))

        tok = jnp.stack(tokens, axis=1)  # [B, T, E]
        h = MultiLayerDecoder(embed_dim=E, name="decoder")(tok)
        out = nn.Dense(self.latent_dim, name="latent_head")(h)
        if self.bc_mode:
            out = jnp.tanh(out)
        return out
