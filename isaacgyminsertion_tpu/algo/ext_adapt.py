"""ExtrinsicAdapt — stage-2 student distillation by online DAgger (fused jit).

Parity target: algo/ext_adapt/ext_adapt.py (SURVEY.md §2.3, §3.3):
  - frozen teacher ActorCriticSplit + RMS (ext_adapt.py:229-236, 304-306)
  - student MultiModalModel per modality flags (obs/tactile/img/seg/pcl)
  - rollout mixes teacher/student actions with annealed β: teacher-only for
    the first 1e6 env steps, then β 1→0 over 3e6 (ext_adapt.py:713-726);
    per-env Bernoulli(β) choice per step
  - StudentBuffer stores normalized modalities + teacher actions + latent_gt
    (ext_adapt.py:693-710)
  - loss = action MSE with weight 0.1 on the z translation axis
    (ext_adapt.py:814-819) [+ optional latent MSE vs latent_gt, :806];
    only-BC mode regresses a 6-dim tanh action directly
  - seg preprocessing to {plug=2, socket=3} masks (ext_adapt.py:391-402),
    per-point pcl RMS normalizer (:254-255, 408), student-obs RMS

TPU design: rollout (teacher+student forward + env step) and the minibatch
update loop run in ONE jit per epoch, like the PPO trainer; multi-chip via
the same GSPMD dp sharding.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs import insertion
from ..envs.config import TaskConfig
from ..models.actor_critic import ActorCriticSplit
from ..models.running_mean_std import RMSState, rms_init, rms_normalize, rms_update
from ..models.student import MultiModalModel
from ..sensors.camera import SEG_PLUG, SEG_SOCKET


@dataclass(frozen=True)
class DAggerConfig:
    # horizon/mini_epochs: the reference student reuses the teacher's PPO
    # yaml (horizon_length 64, mini_epochs 8, FactoryTaskInsertionTactilePPOv2
    # .yaml:33-34) — round-3 ran 32/4, a silent deviation, fixed round 4
    horizon: int = 64
    mini_epochs: int = 8
    learning_rate: float = 3.0e-4       # Adam lr 3e-4 (ext_adapt.py:307)
    grad_norm: float = 0.5              # clip_grad_norm_ 0.5 (ext_adapt.py:855)
    teacher_only_steps: float = 1.0e6   # ext_adapt.py:713-726
    beta_anneal_steps: float = 3.0e6
    # The reference COMMENTS OUT the latent term: loss = action_scale *
    # loss_action  # + latent_scale * loss_latent (ext_adapt.py:828-830).
    # Round-3 trained with coef 1.0 — the oscillating latent objective
    # (predicting the exact 8-dim priv latent from sensors on OOD states)
    # dominated the plateaued action loss. Default now matches the reference.
    latent_loss_coef: float = 0.0
    action_z_weight: float = 0.1        # ext_adapt.py:814-819
    only_bc: bool = False
    # modality flags (train cfg ppo.{obs,tactile,img,seg,pcl}_info)
    use_obs: bool = True
    use_tactile: bool = False
    use_img: bool = False
    use_seg: bool = False
    use_pcl: bool = False
    # triage-only upper-bound control (VERDICT r3 item 1b, no reference
    # counterpart): feed the normalized privileged vector to the student as
    # an extra linear input. If THIS student can't reach teacher-level
    # success through the same trainer, the DAgger loop is the bug, not the
    # perception stack.
    use_priv: bool = False
    # DAgger data aggregation (Ross et al. 2011): train on a ring buffer of
    # the last `replay_size` labeled samples instead of only the freshest
    # horizon. The reference trains each epoch on its last horizon ONLY
    # (StudentBuffer, experience.py:49 — rollout-BC, not DAgger-proper);
    # round-4 measured that variant diverging as β→0 (action MSE
    # 0.013→0.36, see ROUND4_NOTES) because each update forgets the
    # teacher-state fit while chasing the newest self-state slice. 0 = off
    # (reference behavior).
    replay_size: int = 0
    # Replay execution mode:
    #   "device_split" (default) — rollout, reservoir scatter, and the
    #     minibatch-update loop run as THREE separate jits; the replay
    #     buffers live as plain device arrays owned by the host driver, the
    #     write cursor is host state. This is the shape of probe_replay_tpu
    #     probes A–E, all of which pass on chip at real scale, and it keeps
    #     the rollout graph identical to the known-good no-replay epoch.
    #   "in_graph" — the round-4 single-jit variant (replay carried through
    #     the donated epoch state). Deterministically dies on TPU with
    #     InvalidArgument at K=400k and compile-scales badly at K=100k
    #     (ROUND4/5_NOTES); kept for the crash repro and CPU tests.
    replay_mode: str = "device_split"
    # Stratified aggregation (round-5, split mode only; no reference
    # counterpart): round-5 attempt-1 showed uniform Algorithm R still
    # spirals for the obs+pcl student — once β→0 the buffer fills with
    # off-distribution self-states whose teacher labels depend on privileged
    # state the student cannot see (irreducible MSE ~0.3 vs 0.013 on
    # teacher-era states), and they swamp the fittable teacher-era data.
    # With stratify=True the reservoir splits in half: reservoir A collects
    # while β ≥ replay_freeze_beta then FREEZES (a permanent uniform sample
    # of the teacher-driven distribution); reservoir B keeps rolling over
    # everything. Each minibatch draws half from each, so the teacher-state
    # fit can never be swamped — a non-uniform weighting of the DAgger
    # aggregate, still a valid Ross-et-al-style reduction.
    replay_stratify: bool = False
    replay_freeze_beta: float = 0.5

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class TeacherBundle(NamedTuple):
    params: Any
    obs_rms: RMSState
    priv_rms: RMSState


class DAggerState(NamedTuple):
    student_params: Any
    opt_state: Any
    stud_obs_rms: RMSState
    pcl_rms: RMSState       # per-point xyz normalizer
    env_state: insertion.EnvState
    rng: jax.Array
    epoch: jax.Array
    agent_steps: jax.Array
    # DAgger aggregation ring buffer (replay_size > 0): pytree of [K, ...]
    # sample arrays + write cursor + fill count. None/zeros when off.
    replay: Any = None
    replay_cursor: jax.Array = None
    replay_fill: jax.Array = None


def _seg_masks(seg: jax.Array) -> jax.Array:
    """{plug, socket} binary masks stacked as channels (ext_adapt.py:391-402)."""
    plug = (seg == SEG_PLUG).astype(jnp.float32)
    sock = (seg == SEG_SOCKET).astype(jnp.float32)
    return jnp.stack([plug, sock], axis=-1)  # [..., H, W, 2]


def _student_inputs(da_cfg: DAggerConfig, state: DAggerState, out_obs, out, teacher=None):
    """Normalize / preprocess modalities into the student's input dict."""
    inp = {}
    if da_cfg.use_obs:
        obs_in = rms_normalize(state.stud_obs_rms, out_obs)
        if da_cfg.use_priv and out.priv_info is not None and teacher is not None:
            obs_in = jnp.concatenate(
                [obs_in, rms_normalize(teacher.priv_rms, out.priv_info)], axis=-1)
        inp["obs"] = obs_in
    if da_cfg.use_tactile:
        inp["tactile"] = out.tactile
    if da_cfg.use_img:
        img = out.img
        if da_cfg.use_seg:
            # reference masks the depth image to plug|socket pixels when seg
            # is available (process_obs, ext_adapt.py:391-402)
            valid = ((out.seg == SEG_PLUG) | (out.seg == SEG_SOCKET)).astype(img.dtype)
            img = img * valid
        inp["img"] = img
    if da_cfg.use_seg:
        inp["seg"] = _seg_masks(out.seg[:, -1])[:, None]
    if da_cfg.use_pcl:
        p = out.pcl[:, -1] if out.pcl.ndim == 4 else out.pcl
        inp["pcl"] = rms_normalize(state.pcl_rms, p)
    return inp


def _sample_modalities(da_cfg: DAggerConfig, out, n_envs: int) -> dict:
    """Modality arrays for one stored training sample, with everything the
    student does NOT consume replaced by a zero-size [N, 0] placeholder.
    `_student_inputs` never touches unused modalities, so the placeholder is
    shape-compatible with the loss path while costing nothing in the rollout
    batch or the replay reservoir. `seg` is kept when EITHER use_seg or
    use_img is on (the depth image is seg-masked, ext_adapt.py:391-402)."""
    empty = jnp.zeros((n_envs, 0), jnp.float32)
    return dict(
        tactile=out.tactile if da_cfg.use_tactile else empty,
        img=out.img if da_cfg.use_img else empty,
        seg=out.seg if (da_cfg.use_seg or da_cfg.use_img) else empty,
        pcl=out.pcl if da_cfg.use_pcl else empty,
    )


def decoder_only_mask(student_params) -> Any:
    """Trainable-mask for phase-3 restores (ext_adapt.py ~1135-1150): freeze
    everything except the token-fusion decoder and the latent head."""
    def mark(path_leaf):
        path, leaf = path_leaf
        names = "/".join(str(p.key) for p in path if hasattr(p, "key"))
        return ("decoder" in names) or ("latent_head" in names)

    flat = jax.tree_util.tree_flatten_with_path(student_params)[0]
    treedef = jax.tree_util.tree_structure(student_params)
    return jax.tree_util.tree_unflatten(treedef, [mark(pl) for pl in flat])


def build(
    cfg_task: TaskConfig,
    da_cfg: DAggerConfig,
    model,
    subs,
    n_envs: int,
    teacher: TeacherBundle,
    rng: jax.Array,
    phase3: bool = False,
    gan_params=None,
):
    """Construct the student, initial DAggerState and the jitted train epoch."""
    obs_dim = cfg_task.env.num_obs_hist * cfg_task.env.num_observations
    teacher_net = ActorCriticSplit(
        num_actions=cfg_task.env.num_actions,
        obs_dim=obs_dim,
        priv_dim=cfg_task.env.num_states,
    )
    n_pcl = (
        (cfg_task.env.num_points if cfg_task.env.include_plug_pcl else 0)
        + (cfg_task.env.num_points_socket if cfg_task.env.merge_socket_pcl else 0)
        + (cfg_task.env.num_points_goal if cfg_task.env.merge_goal_pcl else 0)
    )
    student = MultiModalModel(
        use_obs=da_cfg.use_obs,
        use_tactile=da_cfg.use_tactile,
        use_img=da_cfg.use_img,
        use_seg=da_cfg.use_seg,
        use_pcl=da_cfg.use_pcl,
        latent_dim=6 if da_cfg.only_bc else 8,
        bc_mode=da_cfg.only_bc,
        num_points=cfg_task.env.num_points if cfg_task.env.include_plug_pcl else 0,
        num_points_socket=cfg_task.env.num_points_socket if cfg_task.env.merge_socket_pcl else 0,
        num_points_goal=cfg_task.env.num_points_goal if cfg_task.env.merge_goal_pcl else 0,
    )

    k_env, k_stud, k_train = jax.random.split(rng, 3)
    env_state = insertion.reset_all(cfg_task, model, subs, k_env, n_envs)
    _, out0 = insertion.step(
        cfg_task, model, subs, env_state, jnp.zeros((n_envs, cfg_task.env.num_actions))
    )
    dummy_state = DAggerState(
        student_params=None, opt_state=None,
        stud_obs_rms=rms_init((obs_dim,)), pcl_rms=rms_init((3,)),
        env_state=env_state, rng=k_train,
        epoch=jnp.zeros((), jnp.int32), agent_steps=jnp.zeros((), jnp.float32),
    )
    out0 = out0._replace(priv_info=insertion.priv_info_of(cfg_task, model, env_state))
    inp0 = _student_inputs(da_cfg, dummy_state, out0.student_obs, out0, teacher=teacher)
    student_params = student.init(k_stud, **inp0)

    # Adam (not AdamW: the reference has no weight decay, ext_adapt.py:307)
    tx = optax.chain(
        optax.clip_by_global_norm(da_cfg.grad_norm),
        optax.adam(da_cfg.learning_rate),
    )
    if phase3:
        # phase-3 partial training: only the decoder/latent-head update
        # (optax.masked would pass frozen updates through — must zero them)
        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", decoder_only_mask(student_params)
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    split = da_cfg.replay_size > 0 and da_cfg.replay_mode == "device_split"
    replay = None
    cursor = fill = None
    if da_cfg.replay_size > 0:
        replay0 = _replay_arrays(cfg_task, da_cfg, env_state, out0, n_envs)
        if not split:  # in-graph mode carries the reservoir in the state
            replay = replay0
            cursor = jnp.zeros((), jnp.int32)
            fill = jnp.zeros((), jnp.int32)
    state = dummy_state._replace(
        student_params=student_params,
        opt_state=tx.init(student_params),
        env_state=env_state,
        replay=replay, replay_cursor=cursor, replay_fill=fill,
    )
    if split:
        train_epoch = make_split_replay_epoch(
            cfg_task, da_cfg, model, subs, teacher_net, teacher, student, tx,
            replay0, n_envs, gan_params=gan_params)
    else:
        train_epoch = make_train_epoch(cfg_task, da_cfg, model, subs, teacher_net, teacher, student, tx, gan_params=gan_params)
    return student, tx, state, train_epoch


def _replay_arrays(cfg_task, da_cfg: DAggerConfig, env_state, out0, n_envs,
                   K: int | None = None):
    """Zero-initialized reservoir, one slot per labeled sample, shaped like
    the rollout sample dict. ONLY student-consumed modalities are stored
    (`_sample_modalities`): the env may render img+seg purely to assemble the
    point cloud (the s2 recipe), and storing those too costs 28 KB/sample
    instead of 7 — 11 GB at K=400k, past v5e HBM. Frame fields are stored f16
    (pure [0,1] frames / metric clouds; quantization ≪ the env's own DR
    noise)."""
    K = K if K is not None else da_cfg.replay_size
    sample0 = dict(
        obs=env_state.obs_queue, student_obs=env_state.obs_stud_queue,
        t_actions=jnp.zeros((n_envs, cfg_task.env.num_actions)),
        latent_gt=jnp.zeros((n_envs, 8)),
        **_sample_modalities(da_cfg, out0, n_envs),
    )
    if da_cfg.use_priv:
        sample0["priv"] = out0.priv_info
    _half = lambda k, x: (jnp.float16 if k in ("tactile", "img", "seg", "pcl")
                          and x.dtype == jnp.float32 else x.dtype)
    # Distinct fill value per key, NOT zeros. Two same-shaped all-zero arrays
    # can be deduplicated into ONE device buffer (runtime/backend dependent;
    # XLA also CSEs identical outputs of one executable) — and a donated dict
    # containing the same buffer twice dies with INVALID_ARGUMENT "Attempt to
    # donate the same buffer twice in Execute()" — the round-4 chip crash
    # class (ROUND5_NOTES). Pre-fill slots are never read: minibatch sampling
    # is bounded by the fill count, which only covers written slots.
    return {k: jnp.full((K,) + v.shape[1:], (i + 1) * 1e-6, _half(k, v))
            for i, (k, v) in enumerate(sample0.items())}


def make_student_act(cfg_task, da_cfg: DAggerConfig, teacher_net,
                     teacher: TeacherBundle, student):
    """Student forward: modalities → latent → frozen-actor action
    (ext_adapt.py act_inference path with the student latent injected).
    Shared by the train epoch and the standalone student evaluation."""

    def student_act(student_params, da_state, obs_n, out):
        inp = _student_inputs(da_cfg, da_state, obs_n, out, teacher=teacher)
        pred = student.apply(student_params, **inp)
        if da_cfg.only_bc:
            return pred, pred
        # inject student latent into the frozen actor (act_inference path);
        # priv input is a placeholder — the injected latent overrides it
        o = rms_normalize(teacher.obs_rms, obs_n)
        zeros_priv = jnp.zeros(obs_n.shape[:-1] + (cfg_task.env.num_states,), obs_n.dtype)
        mu, _, _, _, _ = teacher_net.apply(teacher.params, o, zeros_priv, latent=pred)
        return jnp.clip(mu, -1.0, 1.0), pred

    return student_act


def _prev_out_of(env_state, cfg_task):
    """Wrap the env-state queues as a StepOutput for the CURRENT state (the
    reference stores modalities produced by the previous post_physics)."""
    obs = env_state.obs_queue
    return insertion.StepOutput(
        obs=obs, student_obs=env_state.obs_stud_queue, priv_info=None,
        rew=jnp.zeros(obs.shape[0]), reset=env_state.reset_buf,
        timeout=env_state.timeout_reset_buf, extras={},
        tactile=env_state.tactile_queue, img=env_state.img_queue,
        seg=env_state.seg_queue, pcl=env_state.pcl_queue,
        contacts=env_state.contact_queue,
    )


def _make_core(cfg_task, da_cfg: DAggerConfig, model, subs, teacher_net,
               teacher: TeacherBundle, student, gan_params=None):
    """rollout_step + loss_fn, shared by the in-graph and split epoch builders."""
    env_step = lambda s, a: insertion.step(cfg_task, model, subs, s, a,
                                           gan_params=gan_params)
    act_dim = cfg_task.env.num_actions

    def teacher_act(obs, priv):
        o = rms_normalize(teacher.obs_rms, obs)
        p = rms_normalize(teacher.priv_rms, priv)
        mu, _, _, latent_gt, _ = teacher_net.apply(teacher.params, o, p)
        return jnp.clip(mu, -1.0, 1.0), latent_gt

    student_act = make_student_act(cfg_task, da_cfg, teacher_net, teacher, student)

    def rollout_step(carry, _):
        env_state, da_state, rng = carry
        rng, k_mix = jax.random.split(rng)
        obs = env_state.obs_queue
        stud_obs_pre = env_state.obs_stud_queue
        priv = insertion.priv_info_of(cfg_task, model, env_state)
        t_actions, latent_gt = teacher_act(obs, priv)

        prev_out = _prev_out_of(env_state, cfg_task)._replace(priv_info=priv)
        s_actions, s_latent = student_act(da_state.student_params, da_state,
                                          stud_obs_pre, prev_out)

        # annealed β (ext_adapt.py:713-726): β = max(0, 1 - steps/3e6) from
        # step 0, PLUS a teacher-only phase for the first 1e6 steps that the
        # reference applies only when tactile is OFF (`if agent_steps < 1e6
        # and not self.tactile_info`). Design delta: per-env Bernoulli(β)
        # instead of the reference's one global coin per step — same
        # expectation, smoother state-distribution anneal.
        steps = da_state.agent_steps
        beta = jnp.clip(1.0 - steps / da_cfg.beta_anneal_steps, 0.0, 1.0)
        use_teacher = jax.random.uniform(k_mix, (obs.shape[0], 1)) < beta
        if not da_cfg.use_tactile:
            use_teacher = use_teacher | (steps < da_cfg.teacher_only_steps)
        mixed = jnp.where(use_teacher, t_actions, s_actions)
        env_state, out = env_step(env_state, mixed)

        sample = dict(
            obs=obs, student_obs=stud_obs_pre, t_actions=t_actions,
            latent_gt=latent_gt,
            **_sample_modalities(da_cfg, prev_out, obs.shape[0]),
        )
        if da_cfg.use_priv:
            sample["priv"] = priv
        metrics = {"reward": jnp.mean(out.rew), "success": jnp.mean(out.extras["successes"]),
                   "beta": beta}
        da_state = da_state._replace(agent_steps=da_state.agent_steps + obs.shape[0])
        return (env_state, da_state, rng), (sample, metrics)

    def loss_fn(student_params, da_state, mb):
        out_like = insertion.StepOutput(
            obs=mb["obs"], student_obs=mb["student_obs"],
            priv_info=mb.get("priv"),
            rew=None, reset=None, timeout=None, extras={},
            tactile=mb["tactile"], img=mb["img"], seg=mb["seg"], pcl=mb["pcl"],
            contacts=None,
        )
        s_actions, s_latent = student_act(student_params, da_state, mb["student_obs"], out_like)
        w = jnp.ones((act_dim,)).at[2].set(da_cfg.action_z_weight)
        action_loss = jnp.mean(w * jnp.square(s_actions - mb["t_actions"]))
        loss = action_loss
        latent_loss = jnp.zeros(())
        if not da_cfg.only_bc and da_cfg.latent_loss_coef > 0:
            latent_loss = jnp.mean(jnp.square(s_latent - mb["latent_gt"]))
            loss = loss + da_cfg.latent_loss_coef * latent_loss
        return loss, {"action_loss": action_loss, "latent_loss": latent_loss}

    return rollout_step, loss_fn


def make_train_epoch(cfg_task, da_cfg: DAggerConfig, model, subs, teacher_net,
                     teacher: TeacherBundle, student, tx, gan_params=None):
    """Single-jit epoch: rollout + (optional in-graph reservoir) + updates."""
    rollout_step, loss_fn = _make_core(cfg_task, da_cfg, model, subs,
                                       teacher_net, teacher, student, gan_params)

    def train_epoch(state: DAggerState):
        carry = (state.env_state, state, state.rng)
        (env_state, state, rng), (traj, roll_metrics) = jax.lax.scan(
            rollout_step, carry, None, length=da_cfg.horizon
        )

        # normalizer updates
        stud_obs_rms = rms_update(state.stud_obs_rms, traj["student_obs"])
        pcl_rms = (
            rms_update(state.pcl_rms, traj["pcl"].reshape(-1, 3))
            if da_cfg.use_pcl and traj["pcl"].size else state.pcl_rms
        )
        state = state._replace(stud_obs_rms=stud_obs_rms, pcl_rms=pcl_rms)

        def fl(x):
            return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])

        batch = {k: fl(v) for k, v in traj.items()}
        B = batch["obs"].shape[0]
        mb_size = max(B // da_cfg.mini_epochs, 1)
        n_mb = B // mb_size

        if da_cfg.replay_size > 0:
            # DAgger aggregation via reservoir sampling (Algorithm R): the
            # buffer stays a UNIFORM sample of every labeled state since
            # epoch 0, so β=1-era teacher states are never forgotten while
            # fresh self-states keep flowing in. Sequential fill until full;
            # then sample g (global index) lands at slot r ~ U[0, g] and is
            # dropped if r >= K (scatter mode='drop').
            K = da_cfg.replay_size
            rng, k_res = jax.random.split(rng)
            t = state.replay_cursor  # total samples seen so far
            g = t + jnp.arange(B)
            r = (jax.random.uniform(k_res, (B,)) * (g + 1).astype(jnp.float32)
                 ).astype(jnp.int32)
            slot = jnp.where(g < K, g, jnp.where(r < K, r, K))  # K = dropped
            replay = {k: state.replay[k].at[slot].set(
                v.astype(state.replay[k].dtype), mode="drop")
                for k, v in batch.items()}
            state = state._replace(
                replay=replay,
                replay_cursor=t + B,
                replay_fill=jnp.minimum(t + B, K),
            )
            source = state.replay
        else:
            source = batch

        def mb_update(carry, idx):
            params, opt_state = carry
            mb = {k: v[idx].astype(jnp.float32) if v.dtype == jnp.float16
                  else v[idx] for k, v in source.items()}
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, state, mb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            return (params, opt_state), aux

        def epoch_body(carry, _):
            params, opt_state, rng_i = carry
            rng_i, kp = jax.random.split(rng_i)
            if da_cfg.replay_size > 0:
                perm = jax.random.randint(kp, (n_mb, mb_size), 0,
                                          jnp.maximum(state.replay_fill, 1))
            else:
                perm = jax.random.permutation(kp, B)[: n_mb * mb_size].reshape(n_mb, mb_size)
            (params, opt_state), aux = jax.lax.scan(mb_update, (params, opt_state), perm)
            return (params, opt_state, rng_i), jax.tree_util.tree_map(jnp.mean, aux)

        (params, opt_state, rng), aux = jax.lax.scan(
            epoch_body, (state.student_params, state.opt_state, rng), None,
            length=da_cfg.mini_epochs,
        )
        aux = jax.tree_util.tree_map(jnp.mean, aux)
        roll = jax.tree_util.tree_map(jnp.mean, roll_metrics)
        metrics = {**aux, **{f"episode/{k}": v for k, v in roll.items()}}
        new_state = state._replace(
            student_params=params, opt_state=opt_state, env_state=env_state,
            rng=rng, epoch=state.epoch + 1,
        )
        return new_state, metrics

    return train_epoch


def make_split_replay_epoch(cfg_task, da_cfg: DAggerConfig, model, subs,
                            teacher_net, teacher: TeacherBundle, student, tx,
                            replay0, n_envs: int, gan_params=None):
    """Replay DAgger epoch as THREE jits composed on the host (the default
    `replay_mode="device_split"`).

    Why not one fused graph: the round-4 in-graph variant (multi-GB reservoir
    donated through the epoch's scan carry) dies on TPU with a deterministic
    `InvalidArgument` at K=400k and compile-scales badly at K=100k, while the
    same reservoir pattern in ISOLATION (probe_replay_tpu.py A–E: real-scale
    scatter, mixed f16/f32 dict, donated carry, traced randint bound) passes
    on chip. This builder reproduces the passing shape:

      1. `rollout(state)`   — identical graph to the known-good no-replay
                              epoch's rollout: scan over the env step, teacher
                              + student forwards, RMS updates; returns the
                              flattened [B, ...] sample batch.
      2. `scatter(replay, batch, t, key)` — Algorithm R reservoir write,
                              replay donated (in-place), cursor `t` is HOST
                              state passed as a traced scalar.
      3. `update(params, opt, norms, replay, fill, key)` — mini_epochs ×
                              n_mb minibatch updates gathered from the
                              reservoir (replay is a read-only input here).

    Everything stays on device; the host only sequences the three calls and
    advances the integer cursor. The returned callable carries
    `host_composed=True` so the trainer does not re-jit it, plus `.replay` /
    `.cursor` attributes for inspection and tests."""
    rollout_step, loss_fn = _make_core(cfg_task, da_cfg, model, subs,
                                       teacher_net, teacher, student, gan_params)
    K = da_cfg.replay_size
    B = da_cfg.horizon * n_envs
    mb_size = max(B // da_cfg.mini_epochs, 1)
    n_mb = B // mb_size
    stratify = da_cfg.replay_stratify
    # stratified: half the capacity is reservoir A (teacher-era, frozen once
    # β < replay_freeze_beta), half reservoir B (rolling over everything);
    # each minibatch draws half from each (DAggerConfig.replay_stratify)
    K_A = K // 2 if stratify else 0
    K_B = K - K_A if stratify else K
    mb_a = mb_size // 2

    def rollout(state: DAggerState):
        carry = (state.env_state, state, state.rng)
        (env_state, state, rng), (traj, roll_metrics) = jax.lax.scan(
            rollout_step, carry, None, length=da_cfg.horizon
        )
        stud_obs_rms = rms_update(state.stud_obs_rms, traj["student_obs"])
        pcl_rms = (
            rms_update(state.pcl_rms, traj["pcl"].reshape(-1, 3))
            if da_cfg.use_pcl and traj["pcl"].size else state.pcl_rms
        )
        rng, k_res, k_upd = jax.random.split(rng, 3)
        state = state._replace(
            stud_obs_rms=stud_obs_rms, pcl_rms=pcl_rms, env_state=env_state,
            rng=rng, epoch=state.epoch + 1,
        )
        batch = {k: v.reshape((B,) + v.shape[2:]) for k, v in traj.items()}
        roll = jax.tree_util.tree_map(jnp.mean, roll_metrics)
        return state, batch, roll, k_res, k_upd

    def make_scatter(cap: int):
        def scatter(replay, batch, t, key):
            # Algorithm R: sequential fill until full; then global sample g
            # lands at slot r ~ U[0, g], dropped if r >= cap (mode='drop')
            g = t + jnp.arange(B)
            r = (jax.random.uniform(key, (B,)) * (g + 1).astype(jnp.float32)
                 ).astype(jnp.int32)
            slot = jnp.where(g < cap, g, jnp.where(r < cap, r, cap))
            return {k: replay[k].at[slot].set(
                batch[k].astype(replay[k].dtype), mode="drop")
                for k in replay}

        return scatter

    def _mb_update_fn(replay_a, replay_b):
        """One minibatch step gathering from reservoir(s); replay_a is None
        in the uniform (non-stratified) mode."""

        def gather(replay, idx):
            return {k: v[idx].astype(jnp.float32) if v.dtype == jnp.float16
                    else v[idx] for k, v in replay.items()}

        def mb_update(carry, idx):
            params, opt_state, da_like = carry
            if replay_a is None:
                mb = gather(replay_b, idx)
            else:
                idx_a, idx_b = idx
                ga, gb = gather(replay_a, idx_a), gather(replay_b, idx_b)
                mb = {k: jnp.concatenate([ga[k], gb[k]], axis=0) for k in ga}
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, da_like, mb)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            return (params, opt_state, da_like), aux

        return mb_update

    def update(params, opt_state, stud_obs_rms, pcl_rms, replay, fill, key):
        da_like = DAggerState(
            student_params=None, opt_state=None, stud_obs_rms=stud_obs_rms,
            pcl_rms=pcl_rms, env_state=None, rng=None,
            epoch=None, agent_steps=None,
        )
        mb_update = _mb_update_fn(None, replay)

        def epoch_body(carry, _):
            params, opt_state, rng_i = carry
            rng_i, kp = jax.random.split(rng_i)
            perm = jax.random.randint(kp, (n_mb, mb_size), 0,
                                      jnp.maximum(fill, 1))
            (params, opt_state, _), aux = jax.lax.scan(
                mb_update, (params, opt_state, da_like), perm)
            return (params, opt_state, rng_i), jax.tree_util.tree_map(jnp.mean, aux)

        (params, opt_state, _), aux = jax.lax.scan(
            epoch_body, (params, opt_state, key), None,
            length=da_cfg.mini_epochs,
        )
        return params, opt_state, jax.tree_util.tree_map(jnp.mean, aux)

    def update_strat(params, opt_state, stud_obs_rms, pcl_rms, replay_a,
                     replay_b, fill_a, fill_b, key):
        da_like = DAggerState(
            student_params=None, opt_state=None, stud_obs_rms=stud_obs_rms,
            pcl_rms=pcl_rms, env_state=None, rng=None,
            epoch=None, agent_steps=None,
        )
        mb_update = _mb_update_fn(replay_a, replay_b)

        def epoch_body(carry, _):
            params, opt_state, rng_i = carry
            rng_i, ka, kb = jax.random.split(rng_i, 3)
            perm_a = jax.random.randint(ka, (n_mb, mb_a), 0,
                                        jnp.maximum(fill_a, 1))
            perm_b = jax.random.randint(kb, (n_mb, mb_size - mb_a), 0,
                                        jnp.maximum(fill_b, 1))
            (params, opt_state, _), aux = jax.lax.scan(
                mb_update, (params, opt_state, da_like), (perm_a, perm_b))
            return (params, opt_state, rng_i), jax.tree_util.tree_map(jnp.mean, aux)

        (params, opt_state, _), aux = jax.lax.scan(
            epoch_body, (params, opt_state, key), None,
            length=da_cfg.mini_epochs,
        )
        return params, opt_state, jax.tree_util.tree_map(jnp.mean, aux)

    # Donation policy (the crux of the round-4 InvalidArgument, ROUND5_NOTES):
    # a jitted program's outputs can be CSE'd — two identical-valued outputs
    # (e.g. plug_pos / obs_plug_pos right after a reset) share ONE device
    # buffer — and donating a pytree containing the same buffer twice dies
    # with INVALID_ARGUMENT "donate the same buffer twice in Execute()".
    # So: rollout/update are NOT donated (their states are CSE-prone epoch
    # outputs; the buffers are small at student scale). The multi-GB replay
    # IS donated — safe because its arrays are distinct by construction
    # (per-key fill values) and scatter outputs are per-key distinct scatter
    # ops XLA cannot CSE. IGT_REPLAY_DONATE=0 opts out (costs a 2x replay
    # double-buffer during the scatter).
    import os as _os
    donate = _os.environ.get("IGT_REPLAY_DONATE", "1") == "1"
    rollout_jit = jax.jit(rollout)

    def jit_scatter(cap):
        fn = make_scatter(cap)
        return jax.jit(fn, donate_argnums=0) if donate else jax.jit(fn)

    class SplitEpoch:
        host_composed = True

        def __init__(self):
            if stratify:
                self.replay_a = {k: v[:K_A] for k, v in replay0.items()}
                self.replay_b = {k: v[K_A:] for k, v in replay0.items()}
                self.scatter_a = jit_scatter(K_A)
                self.scatter_b = jit_scatter(K_B)
                self.update = jax.jit(update_strat)
                self.cursor_a = 0  # teacher-era samples captured (host int)
                self.a_frozen = False
            else:
                self.replay_b = replay0
                self.scatter_b = jit_scatter(K_B)
                self.update = jax.jit(update)
            self.cursor = 0  # total labeled samples seen (host int)

        def __call__(self, state: DAggerState):
            state, batch, roll, k_res, k_upd = rollout_jit(state)
            if stratify:
                # reservoir A collects only while β ≥ replay_freeze_beta
                # (computed on the host: agent_steps == cursor), then freezes
                beta = max(0.0, 1.0 - self.cursor / da_cfg.beta_anneal_steps)
                if beta >= da_cfg.replay_freeze_beta and not self.a_frozen:
                    self.replay_a = self.scatter_a(
                        self.replay_a, batch,
                        jnp.asarray(self.cursor_a, jnp.int32),
                        jax.random.fold_in(k_res, 1))
                    self.cursor_a += B
                else:
                    self.a_frozen = True
            self.replay_b = self.scatter_b(
                self.replay_b, batch, jnp.asarray(self.cursor, jnp.int32), k_res)
            self.cursor += B
            fill_b = jnp.asarray(min(self.cursor, K_B), jnp.int32)
            if stratify:
                fill_a = jnp.asarray(min(max(self.cursor_a, 1), K_A), jnp.int32)
                params, opt_state, aux = self.update(
                    state.student_params, state.opt_state, state.stud_obs_rms,
                    state.pcl_rms, self.replay_a, self.replay_b,
                    fill_a, fill_b, k_upd)
            else:
                params, opt_state, aux = self.update(
                    state.student_params, state.opt_state, state.stud_obs_rms,
                    state.pcl_rms, self.replay_b, fill_b, k_upd)
            state = state._replace(student_params=params, opt_state=opt_state)
            metrics = {**aux, **{f"episode/{k}": v for k, v in roll.items()}}
            return state, metrics

        @property
        def replay(self):  # uniform-mode alias (tests/inspection)
            return self.replay_b

    return SplitEpoch()
