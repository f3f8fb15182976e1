"""Offline student training from npz trajectory datasets.

Parity: algo/models/transformer/runner.py (SURVEY.md §2.3 / §3.5): offline
training loop over collected trajectories with latent+action losses, AdamW +
cosine schedule, train/validate split, checkpointing. The jitted train step
consumes numpy batches from data.dataset.TrajectoryDataset (the torch
DataLoader's 16 workers are unnecessary — batch assembly is trivial next to
the TPU step).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import DataNormalizer, TrajectoryDataset
from ..models.student import MultiModalModel
from ..utils.checkpoint import Checkpointer
from ..utils.metrics import MetricsWriter


@dataclass(frozen=True)
class OfflineConfig:
    batch_size: int = 256
    epochs: int = 10
    learning_rate: float = 1.0e-4
    warmup_steps: int = 100
    action_z_weight: float = 0.1
    latent_loss_coef: float = 1.0
    val_fraction: float = 0.1
    seq_len: int = 1
    only_bc: bool = False


class OfflineRunner:
    """runner.py:25 parity (offline_training path of train_supervised.py)."""

    def __init__(self, cfg: OfflineConfig, data_dir: str, out_dir: str,
                 obs_dim: int = 15, act_dim: int = 6, latent_dim: int = 8,
                 seed: int = 0):
        self.cfg = cfg
        self.normalizer = DataNormalizer(data_dir)
        self.normalizer.run()
        self.dataset = TrajectoryDataset(
            data_dir, seq_len=cfg.seq_len,
            keys=("student_obs", "actions", "latent"),
            normalizer=self.normalizer,
        )
        self.student = MultiModalModel(
            use_obs=True, latent_dim=act_dim if cfg.only_bc else latent_dim,
            bc_mode=cfg.only_bc,
        )
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1, obs_dim * cfg.seq_len))
        self.params = self.student.init(rng, obs=dummy)
        total_steps = max(len(self.dataset) // cfg.batch_size, 1) * cfg.epochs
        sched = optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps, max(total_steps, cfg.warmup_steps + 1)
        )
        self.tx = optax.adamw(sched)
        self.opt_state = self.tx.init(self.params)
        self.ckpt = Checkpointer(out_dir)
        self.writer = MetricsWriter(out_dir)
        self._train_step = jax.jit(self._make_train_step())
        self._eval_step = jax.jit(self._make_eval_step())

    def _loss(self, params, batch):
        obs = batch["student_obs"].reshape(batch["student_obs"].shape[0], -1)
        pred = self.student.apply(params, obs=obs)
        target_act = batch["actions"][:, -1]
        loss = jnp.zeros(())
        aux = {}
        if self.cfg.only_bc:
            w = jnp.ones(target_act.shape[-1]).at[2].set(self.cfg.action_z_weight)
            loss = jnp.mean(w * jnp.square(pred - target_act))
            aux["action_loss"] = loss
        else:
            latent_t = batch["latent"][:, -1]
            lat_loss = jnp.mean(jnp.square(pred - latent_t))
            loss = self.cfg.latent_loss_coef * lat_loss
            aux["latent_loss"] = lat_loss
        aux["loss"] = loss
        return loss, aux

    def _make_train_step(self):
        def step(params, opt_state, batch):
            (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, aux

        return step

    def _make_eval_step(self):
        def step(params, batch):
            _, aux = self._loss(params, batch)
            return aux

        return step

    def run(self) -> dict:
        rng = np.random.default_rng(0)
        n_val = max(int(self.cfg.val_fraction * len(self.dataset) // self.cfg.batch_size), 1)
        step = 0
        last_val = {}
        for epoch in range(self.cfg.epochs):
            train_losses = []
            for batch in self.dataset.batches(self.cfg.batch_size, rng):
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                self.params, self.opt_state, aux = self._train_step(
                    self.params, self.opt_state, jb
                )
                train_losses.append(float(aux["loss"]))
                step += 1
            val_losses = []
            for i, batch in enumerate(self.dataset.batches(self.cfg.batch_size, rng)):
                if i >= n_val:
                    break
                jb = {k: jnp.asarray(v) for k, v in batch.items()}
                val_losses.append(float(self._eval_step(self.params, jb)["loss"]))
            last_val = {
                "train/loss": float(np.mean(train_losses)) if train_losses else float("nan"),
                "val/loss": float(np.mean(val_losses)) if val_losses else float("nan"),
            }
            self.writer.write(step, last_val)
            self.ckpt.save_last({"student_params": self.params}, step)
            self.ckpt.maybe_save_best({"student_params": self.params},
                                      -last_val["val/loss"], float("-inf"))
        return last_val
