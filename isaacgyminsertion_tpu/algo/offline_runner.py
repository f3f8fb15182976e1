"""Offline student training from npz trajectory datasets — multimodal.

Parity: algo/models/transformer/runner.py:150-304 + data.py:337-374
(SURVEY.md §2.3 / §3.5): offline training of the MultiModalModel over any
subset of {obs, tactile, img, seg, pcl} from collected trajectories, with
latent / action losses, optional frozen-teacher action regularization
(runner.py:237-241), AdamW + warmup-cosine schedule, and checkpointing.

Conscious fix vs the reference: validation batches are drawn from a
trajectory-level HELD-OUT split (data.dataset.split_trajectory_files), not
from the same shuffled pool as training — best-checkpoint selection is on
genuinely unseen trajectories.

Preprocessing parity:
  - tactile differenced against trajectory frame 1 (data.py:337-347)
  - seg masked to {plug=2, socket=3} binary channels (ext_adapt.py:391-402)
  - img+seg synchronized random spatial jitter (SyncRandomReshapeTransform,
    transformer/utils.py:12-68 — same shift applied to both)
  - pcl normalized by dataset xyz stats (per-point RMS parity)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.dataset import DataNormalizer, TrajectoryDataset, split_trajectory_files
from ..models.student import MultiModalModel
from ..utils.checkpoint import Checkpointer, restore_path
from ..utils.metrics import MetricsWriter

SEG_PLUG, SEG_SOCKET = 2, 3


@dataclass(frozen=True)
class OfflineConfig:
    batch_size: int = 256
    epochs: int = 10
    learning_rate: float = 1.0e-4
    warmup_steps: int = 100
    action_z_weight: float = 0.1
    latent_loss_coef: float = 1.0
    action_reg_coef: float = 1.0     # frozen-teacher action regularization
    val_fraction: float = 0.1
    seq_len: int = 1
    only_bc: bool = False
    # modality flags (offline_config.yaml model dims / runner.py:86-95)
    use_obs: bool = True
    use_tactile: bool = False
    use_img: bool = False
    use_seg: bool = False
    use_pcl: bool = False
    tactile_diff: bool = True
    img_jitter: int = 3              # max sync spatial jitter (pixels)


def _seg_masks_np(seg: np.ndarray) -> np.ndarray:
    plug = (seg == SEG_PLUG).astype(np.float32)
    sock = (seg == SEG_SOCKET).astype(np.float32)
    return np.stack([plug, sock], axis=-1)  # [..., H, W, 2]


class OfflineRunner:
    """runner.py:25 parity (offline_training path of train_supervised.py)."""

    def __init__(self, cfg: OfflineConfig, data_dir: str, out_dir: str,
                 obs_dim: int = 15, act_dim: int = 6, latent_dim: int = 8,
                 seed: int = 0, teacher_ckpt: str = ""):
        self.cfg = cfg
        self.normalizer = DataNormalizer(data_dir)
        self.normalizer.run()
        keys = ["student_obs", "actions", "latent"]
        if teacher_ckpt:
            keys += ["obs", "priv_info"]
        if cfg.use_tactile:
            keys.append("tactile")
        if cfg.use_img:
            keys.append("img")
        if cfg.use_seg:
            keys.append("seg")
        if cfg.use_pcl:
            keys.append("pcl")
        train_files, val_files = split_trajectory_files(data_dir, cfg.val_fraction,
                                                        seed=seed)
        mk = lambda files: TrajectoryDataset(
            data_dir, seq_len=cfg.seq_len, keys=tuple(keys),
            normalizer=self.normalizer, files=files,
            tactile_diff=cfg.tactile_diff and cfg.use_tactile,
        )
        self.dataset = mk(train_files)
        self.val_dataset = mk(val_files) if val_files else None

        self.student = MultiModalModel(
            use_obs=cfg.use_obs, use_tactile=cfg.use_tactile, use_img=cfg.use_img,
            use_seg=cfg.use_seg, use_pcl=cfg.use_pcl,
            latent_dim=act_dim if cfg.only_bc else latent_dim,
            bc_mode=cfg.only_bc,
        )
        # frozen-teacher action regularization (runner.py:237-241): predicted
        # latent → frozen actor → action MSE vs the logged teacher action
        self.teacher = None
        if teacher_ckpt and not cfg.only_bc:
            from ..models.actor_critic import ActorCriticSplit
            from ..models.running_mean_std import rms_normalize

            tree = restore_path(teacher_ckpt)
            t_obs_dim = np.asarray(tree["obs_rms"].mean).shape[-1]
            t_priv_dim = np.asarray(tree["priv_rms"].mean).shape[-1]
            net = ActorCriticSplit(num_actions=act_dim, obs_dim=t_obs_dim,
                                   priv_dim=t_priv_dim)
            self.teacher = dict(net=net, params=tree["params"],
                                obs_rms=tree["obs_rms"], priv_rms=tree["priv_rms"],
                                normalize=rms_normalize)

        rng = jax.random.PRNGKey(seed)
        dummy = self._dummy_inputs(obs_dim)
        self.params = self.student.init(rng, **dummy)
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
        self._jit_rng = np.random.default_rng(seed)

    def _dummy_inputs(self, obs_dim: int) -> dict:
        cfg = self.cfg
        dummy = {}
        if cfg.use_obs:
            dummy["obs"] = jnp.zeros((1, obs_dim * cfg.seq_len))
        # shapes discovered from the first trajectory's stored arrays
        traj0 = self.dataset._trajs[0]
        if cfg.use_tactile:
            t = traj0["tactile"]
            dummy["tactile"] = jnp.zeros((1, cfg.seq_len) + t.shape[1:], jnp.float32)
        if cfg.use_img:
            im = traj0["img"]
            dummy["img"] = jnp.zeros((1, cfg.seq_len) + im.shape[1:], jnp.float32)
        if cfg.use_seg:
            sg = traj0["seg"]
            dummy["seg"] = jnp.zeros((1, 1) + sg.shape[1:] + (2,), jnp.float32)
        if cfg.use_pcl:
            p = traj0["pcl"]
            dummy["pcl"] = jnp.zeros((1,) + p.shape[1:], jnp.float32)
        return dummy

    # ------------------------------------------------------------------ #
    # batch preprocessing (host-side numpy)
    # ------------------------------------------------------------------ #

    def _prepare(self, batch: dict, rng: np.random.Generator, augment: bool) -> dict:
        cfg = self.cfg
        out = {"actions": jnp.asarray(batch["actions"][:, -1])}
        if "latent" in batch:
            out["latent"] = jnp.asarray(batch["latent"][:, -1])
        if self.teacher is not None:
            out["t_obs"] = jnp.asarray(batch["obs"][:, -1])
            out["t_priv"] = jnp.asarray(batch["priv_info"][:, -1])
        inp = {}
        if cfg.use_obs:
            so = batch["student_obs"]
            inp["obs"] = jnp.asarray(so.reshape(so.shape[0], -1))
        if cfg.use_tactile:
            inp["tactile"] = jnp.asarray(batch["tactile"].astype(np.float32))
        img = batch.get("img")
        seg = batch.get("seg")
        if augment and cfg.img_jitter > 0 and (img is not None or seg is not None):
            # synchronized random spatial jitter: the SAME shift for img and
            # seg of a sample (SyncRandomReshapeTransform parity)
            ref = img if img is not None else seg
            B = ref.shape[0]
            dy = rng.integers(-cfg.img_jitter, cfg.img_jitter + 1, B)
            dx = rng.integers(-cfg.img_jitter, cfg.img_jitter + 1, B)
            def shift(a):
                a = a.copy()
                for i in range(B):
                    a[i] = np.roll(a[i], (int(dy[i]), int(dx[i])), axis=(-2, -1))
                return a
            if img is not None:
                img = shift(img)
            if seg is not None:
                seg = shift(seg)
        if cfg.use_img and img is not None:
            inp["img"] = jnp.asarray(img.astype(np.float32))
        if cfg.use_seg and seg is not None:
            inp["seg"] = jnp.asarray(_seg_masks_np(seg[:, -1])[:, None])
        if cfg.use_pcl:
            inp["pcl"] = jnp.asarray(batch["pcl"][:, -1].astype(np.float32))
        out["inputs"] = inp
        return out

    # ------------------------------------------------------------------ #
    # loss / steps
    # ------------------------------------------------------------------ #

    def _loss(self, params, batch):
        cfg = self.cfg
        pred = self.student.apply(params, **batch["inputs"])
        target_act = batch["actions"]
        loss = jnp.zeros(())
        aux = {}
        if cfg.only_bc:
            w = jnp.ones(target_act.shape[-1]).at[2].set(cfg.action_z_weight)
            loss = jnp.mean(w * jnp.square(pred - target_act))
            aux["action_loss"] = loss
        else:
            latent_t = batch["latent"]
            lat_loss = jnp.mean(jnp.square(pred - latent_t))
            loss = cfg.latent_loss_coef * lat_loss
            aux["latent_loss"] = lat_loss
            if self.teacher is not None:
                t = self.teacher
                o = t["normalize"](t["obs_rms"], batch["t_obs"])
                p = t["normalize"](t["priv_rms"], batch["t_priv"])
                mu, _, _, _, _ = t["net"].apply(t["params"], o, p, latent=pred)
                w = jnp.ones(target_act.shape[-1]).at[2].set(cfg.action_z_weight)
                act_loss = jnp.mean(w * jnp.square(mu - target_act))
                loss = loss + cfg.action_reg_coef * act_loss
                aux["action_loss"] = act_loss
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

    # ------------------------------------------------------------------ #
    # training loop
    # ------------------------------------------------------------------ #

    def run(self) -> dict:
        rng = np.random.default_rng(0)
        step = 0
        last = {}
        for epoch in range(self.cfg.epochs):
            train_losses = []
            for batch in self.dataset.batches(self.cfg.batch_size, rng):
                jb = self._prepare(batch, rng, augment=True)
                self.params, self.opt_state, aux = self._train_step(
                    self.params, self.opt_state, jb
                )
                train_losses.append(float(aux["loss"]))
                step += 1
            val_losses = []
            if self.val_dataset is not None:
                bs = min(self.cfg.batch_size, max(len(self.val_dataset), 1))
                for batch in self.val_dataset.batches(bs, np.random.default_rng(1)):
                    jb = self._prepare(batch, rng, augment=False)
                    val_losses.append(float(self._eval_step(self.params, jb)["loss"]))
            last = {
                "train/loss": float(np.mean(train_losses)) if train_losses else float("nan"),
                "val/loss": float(np.mean(val_losses)) if val_losses else float("nan"),
            }
            self.writer.write(step, last)
            self.ckpt.save_last({"student_params": self.params}, step)
            # best-checkpoint selection on HELD-OUT loss (train loss only as
            # a fallback when the dataset is too small to split)
            score = -last["val/loss"] if val_losses else -last["train/loss"]
            if np.isfinite(score):
                self.ckpt.maybe_save_best({"student_params": self.params},
                                          score, float("-inf"))
        return last

    # ------------------------------------------------------------------ #
    # live-env replay evaluation (offline_training_w_env parity:
    # reference train.py:124-128 + transformer/runner.py:194-304 — an
    # offline-trained student is validated by driving the live vectorized
    # env with it and measuring first-episode success)
    # ------------------------------------------------------------------ #

    def _rms_of(self, key: str):
        """Adapt DataNormalizer {mean, std} stats to the RMSState the env
        eval path normalizes with (var = std², effectively infinite count)."""
        from ..models.running_mean_std import RMSState

        s = self.normalizer.stats.get(key)
        if s is None:
            from ..models.running_mean_std import rms_init

            return rms_init((3,) if key == "pcl" else (15,))
        return RMSState(mean=jnp.asarray(s["mean"]),
                        var=jnp.asarray(s["std"]) ** 2,
                        count=jnp.asarray(1e8, jnp.float32))

    def replay_eval(self, cfg_task, n_envs: int = 64, seed: int = 1234,
                    teacher_ckpt: str = "") -> float:
        """Replay the trained student against the live env; returns the
        first-episode success rate under the reference eval convention
        (resets disabled)."""
        import dataclasses as _dc

        from ..algo.ext_adapt import DAggerConfig, TeacherBundle
        from ..algo.trainer import make_student_eval_fn
        from ..assets import build_subassembly_set
        from ..models.actor_critic import ActorCriticSplit
        from ..physics.robot import build_kuka_openhand

        cfg = self.cfg
        task = cfg_task.replace(
            reset_at_fails=False, reset_at_success=False,
            randomize=_dc.replace(cfg_task.randomize,
                                  clearance_curriculum_extra=0.0))
        da_cfg = DAggerConfig(
            only_bc=cfg.only_bc, use_obs=cfg.use_obs, use_tactile=cfg.use_tactile,
            use_img=cfg.use_img, use_seg=cfg.use_seg, use_pcl=cfg.use_pcl,
        )
        model = build_kuka_openhand()
        subs = build_subassembly_set()
        obs_dim = task.env.num_obs_hist * task.env.num_observations
        teacher_net = ActorCriticSplit(num_actions=task.env.num_actions,
                                       obs_dim=obs_dim,
                                       priv_dim=task.env.num_states)
        if teacher_ckpt:
            tree = restore_path(teacher_ckpt)
            teacher = TeacherBundle(tree["params"], tree["obs_rms"], tree["priv_rms"])
        else:
            # only-BC students never query the teacher at eval; a zero bundle
            # keeps the shared eval path happy
            from ..models.running_mean_std import rms_init

            z = self.student.init(jax.random.PRNGKey(0), **self._dummy_inputs(
                obs_dim // task.env.num_obs_hist))
            teacher = TeacherBundle(z, rms_init((obs_dim,)),
                                    rms_init((task.env.num_states,)))
        eval_fn = make_student_eval_fn(task, da_cfg, model, subs, teacher_net,
                                       teacher, self.student, n_envs)
        sr = eval_fn(self.params, self._rms_of("student_obs"),
                     self._rms_of("pcl"), jax.random.PRNGKey(seed))
        self.writer.write(0, {"replay/success_rate": sr})
        print(f"Replay Success Rate: {sr:.4f}")
        return sr
