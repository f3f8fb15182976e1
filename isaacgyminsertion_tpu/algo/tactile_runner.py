"""Tactile-only regression runner (parity: transformer/tactile_runner.py:27).

Trains a tactile encoder to regress pose deltas (tactile → plug-in-hand pose)
from recorded data — the reference uses real AllSight recordings; here the
same trainer runs on sim-rendered tactile frames from the data logger or on
imported real data with the same npz schema (tactile [T, F, H, W, C],
plug_hand_pos/quat targets)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.student import TactileCNN
from ..utils.checkpoint import Checkpointer
from ..utils.metrics import MetricsWriter


@dataclass(frozen=True)
class TactileRunnerConfig:
    batch_size: int = 64
    epochs: int = 10
    learning_rate: float = 3.0e-4
    target_dim: int = 7  # pos 3 + quat 4


class TactileRegressionRunner:
    def __init__(self, cfg: TactileRunnerConfig, out_dir: str, seed: int = 0):
        self.cfg = cfg
        self.encoder = TactileCNN(out_dim=64)
        import flax.linen as nn

        class Head(nn.Module):
            target_dim: int

            @nn.compact
            def __call__(self, x):
                h = TactileCNN(out_dim=64)(x)
                h = nn.relu(nn.Dense(64)(h))
                return nn.Dense(self.target_dim)(h)

        self.net = Head(target_dim=cfg.target_dim)
        self.params = None
        self.tx = optax.adamw(cfg.learning_rate)
        self.ckpt = Checkpointer(out_dir)
        self.writer = MetricsWriter(out_dir)

        def train_step(params, opt_state, tactile, target):
            def loss_fn(p):
                pred = self.net.apply(p, tactile)
                return jnp.mean(jnp.square(pred - target))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step)

    def fit(self, tactile: np.ndarray, targets: np.ndarray) -> float:
        """tactile [S, F, H, W, C], targets [S, target_dim]."""
        rng = np.random.default_rng(0)
        if self.params is None:
            self.params = self.net.init(jax.random.PRNGKey(0), jnp.asarray(tactile[:1]))
            self.opt_state = self.tx.init(self.params)
        S = tactile.shape[0]
        last = float("nan")
        step = 0
        for epoch in range(self.cfg.epochs):
            order = rng.permutation(S)
            for s in range(0, S - self.cfg.batch_size + 1, self.cfg.batch_size):
                idx = order[s:s + self.cfg.batch_size]
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, jnp.asarray(tactile[idx]),
                    jnp.asarray(targets[idx]),
                )
                last = float(loss)
                step += 1
            self.writer.write(step, {"train/tactile_loss": last})
        self.ckpt.save_last({"params": self.params}, step)
        return last

    def predict(self, tactile: np.ndarray) -> np.ndarray:
        return np.asarray(self.net.apply(self.params, jnp.asarray(tactile)))
