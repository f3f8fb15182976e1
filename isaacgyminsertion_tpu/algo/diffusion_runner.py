"""Diffusion-policy training runner (parity: algo/models/diffusion
train_diffusion.py Runner/Agent): trains the chunked diffusion policy on
collected trajectories (obs → action chunk), keeps EMA weights, evaluates by
DDIM sampling."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import DataNormalizer, TrajectoryDataset
from ..models.diffusion import DiffusionPolicy
from ..utils.checkpoint import Checkpointer
from ..utils.metrics import MetricsWriter


@dataclass(frozen=True)
class DiffusionConfig:
    chunk: int = 8
    batch_size: int = 128
    epochs: int = 10
    learning_rate: float = 1.0e-4
    num_diffusion_steps: int = 100


class DiffusionRunner:
    def __init__(self, cfg: DiffusionConfig, data_dir: str, out_dir: str,
                 obs_dim: int = 15, act_dim: int = 6, seed: int = 0):
        self.cfg = cfg
        self.normalizer = DataNormalizer(data_dir)
        self.normalizer.run()
        self.dataset = TrajectoryDataset(
            data_dir, seq_len=cfg.chunk, keys=("student_obs", "actions"),
            normalizer=self.normalizer,
        )
        self.policy = DiffusionPolicy(act_dim=act_dim, chunk=cfg.chunk,
                                      obs_dim=obs_dim,
                                      num_diffusion_steps=cfg.num_diffusion_steps)
        self.params = self.policy.init(jax.random.PRNGKey(seed))
        self.ema_params = self.params
        self.tx = optax.adamw(cfg.learning_rate)
        self.opt_state = self.tx.init(self.params)
        self.ckpt = Checkpointer(out_dir)
        self.writer = MetricsWriter(out_dir)

        def train_step(params, ema, opt_state, rng, actions, obs):
            loss, grads = jax.value_and_grad(self.policy.loss)(params, rng, actions, obs)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = self.policy.ema_update(ema, params)
            return params, ema, opt_state, loss

        self._train_step = jax.jit(train_step)
        self._sample = jax.jit(
            lambda params, rng, obs: self.policy.sample_ddim(params, rng, obs)
        )

    def run(self) -> dict:
        rng_np = np.random.default_rng(0)
        rng = jax.random.PRNGKey(1)
        step = 0
        losses = []
        for epoch in range(self.cfg.epochs):
            for batch in self.dataset.batches(self.cfg.batch_size, rng_np):
                rng, k = jax.random.split(rng)
                actions = jnp.asarray(batch["actions"])
                obs = jnp.asarray(batch["student_obs"][:, 0])  # condition on chunk start
                self.params, self.ema_params, self.opt_state, loss = self._train_step(
                    self.params, self.ema_params, self.opt_state, k, actions, obs
                )
                losses.append(float(loss))
                step += 1
            self.writer.write(step, {"train/diffusion_loss": float(np.mean(losses[-50:]))})
            self.ckpt.save_last({"params": self.params, "ema_params": self.ema_params}, step)
        return {"train/diffusion_loss": float(np.mean(losses[-50:]))}

    def predict(self, obs: jnp.ndarray, rng) -> jnp.ndarray:
        """DDIM-sample an action chunk from the EMA weights."""
        return self._sample(self.ema_params, rng, obs)
