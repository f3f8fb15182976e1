"""CycleGAN sim2real trainer for tactile images.

Parity: the reference trains a CycleGAN offline and loads `latest_net_G_B.pth`
to translate simulated tactile frames toward the real AllSight distribution
(task cfg tactile.sim2real + model_G, factory_task_insertion.py:100-124,
539-543; nets in allsight/experiments/models/networks.py). This module trains
the flax generators/discriminators (models/zoo.py) with the standard CycleGAN
objective (LSGAN + cycle-consistency + identity) on unpaired (sim, real)
tactile frame sets, and exposes `translate()` — the inference hook the task
pipeline calls when sim2real is enabled.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.zoo import PatchDiscriminator, ResnetGenerator, lsgan_loss
from ..utils.checkpoint import Checkpointer
from ..utils.metrics import MetricsWriter


@dataclass(frozen=True)
class CycleGANConfig:
    epochs: int = 5
    batch_size: int = 16
    learning_rate: float = 2.0e-4
    lambda_cycle: float = 10.0
    lambda_identity: float = 0.5


class CycleGANRunner:
    def __init__(self, cfg: CycleGANConfig, out_dir: str, image_shape=(64, 64, 3),
                 seed: int = 0):
        self.cfg = cfg
        self.G_ab = ResnetGenerator()   # sim → real
        self.G_ba = ResnetGenerator()   # real → sim
        self.D_a = PatchDiscriminator()  # sim domain
        self.D_b = PatchDiscriminator()  # real domain
        k = jax.random.split(jax.random.PRNGKey(seed), 4)
        dummy = jnp.zeros((1,) + image_shape)
        self.params = {
            "g_ab": self.G_ab.init(k[0], dummy), "g_ba": self.G_ba.init(k[1], dummy),
            "d_a": self.D_a.init(k[2], dummy), "d_b": self.D_b.init(k[3], dummy),
        }
        self.tx_g = optax.adam(cfg.learning_rate, b1=0.5)
        self.tx_d = optax.adam(cfg.learning_rate, b1=0.5)
        g_params = {"g_ab": self.params["g_ab"], "g_ba": self.params["g_ba"]}
        d_params = {"d_a": self.params["d_a"], "d_b": self.params["d_b"]}
        self.opt_g = self.tx_g.init(g_params)
        self.opt_d = self.tx_d.init(d_params)
        self.ckpt = Checkpointer(out_dir)
        self.writer = MetricsWriter(out_dir)
        self._train_step = jax.jit(self._make_train_step())

    def _make_train_step(self):
        cfg = self.cfg

        def g_loss_fn(g_params, d_params, a, b):
            fake_b = self.G_ab.apply(g_params["g_ab"], a)
            fake_a = self.G_ba.apply(g_params["g_ba"], b)
            rec_a = self.G_ba.apply(g_params["g_ba"], fake_b)
            rec_b = self.G_ab.apply(g_params["g_ab"], fake_a)
            idt_b = self.G_ab.apply(g_params["g_ab"], b)
            idt_a = self.G_ba.apply(g_params["g_ba"], a)
            adv = lsgan_loss(self.D_b.apply(d_params["d_b"], fake_b), True) + \
                  lsgan_loss(self.D_a.apply(d_params["d_a"], fake_a), True)
            cyc = jnp.mean(jnp.abs(rec_a - a)) + jnp.mean(jnp.abs(rec_b - b))
            idt = jnp.mean(jnp.abs(idt_b - b)) + jnp.mean(jnp.abs(idt_a - a))
            loss = adv + cfg.lambda_cycle * cyc + cfg.lambda_identity * cfg.lambda_cycle * idt
            return loss, (fake_a, fake_b, adv, cyc)

        def d_loss_fn(d_params, a, b, fake_a, fake_b):
            l = (
                lsgan_loss(self.D_a.apply(d_params["d_a"], a), True)
                + lsgan_loss(self.D_a.apply(d_params["d_a"], fake_a), False)
                + lsgan_loss(self.D_b.apply(d_params["d_b"], b), True)
                + lsgan_loss(self.D_b.apply(d_params["d_b"], fake_b), False)
            )
            return 0.5 * l

        def step(params, opt_g, opt_d, a, b):
            g_params = {"g_ab": params["g_ab"], "g_ba": params["g_ba"]}
            d_params = {"d_a": params["d_a"], "d_b": params["d_b"]}
            (g_loss, (fake_a, fake_b, adv, cyc)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params, d_params, a, b)
            g_updates, opt_g = self.tx_g.update(g_grads, opt_g, g_params)
            g_params = optax.apply_updates(g_params, g_updates)
            d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
                d_params, a, b, jax.lax.stop_gradient(fake_a), jax.lax.stop_gradient(fake_b))
            d_updates, opt_d = self.tx_d.update(d_grads, opt_d, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            params = {**g_params, **d_params}
            return params, opt_g, opt_d, {"g_loss": g_loss, "d_loss": d_loss,
                                          "cycle": cyc, "adv": adv}

        return step

    def fit(self, sim_images: np.ndarray, real_images: np.ndarray) -> dict:
        """Unpaired training: sim_images [Sa, H, W, C], real_images [Sb, H, W, C]."""
        rng = np.random.default_rng(0)
        metrics = {}
        step = 0
        for epoch in range(self.cfg.epochs):
            n = min(len(sim_images), len(real_images))
            ia = rng.permutation(len(sim_images))[:n]
            ib = rng.permutation(len(real_images))[:n]
            for s in range(0, n - self.cfg.batch_size + 1, self.cfg.batch_size):
                a = jnp.asarray(sim_images[ia[s:s + self.cfg.batch_size]])
                b = jnp.asarray(real_images[ib[s:s + self.cfg.batch_size]])
                self.params, self.opt_g, self.opt_d, m = self._train_step(
                    self.params, self.opt_g, self.opt_d, a, b)
                metrics = {k: float(v) for k, v in m.items()}
                step += 1
            self.writer.write(step, metrics)
            self.ckpt.save_last({"params": self.params}, step)
        return metrics

    def translate(self, sim_images) -> jnp.ndarray:
        """sim → real translation (the latest_net_G_B inference hook)."""
        return self.G_ab.apply(self.params["g_ab"], jnp.asarray(sim_images))
