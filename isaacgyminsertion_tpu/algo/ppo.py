"""PPO teacher (stage 1) — rollout, GAE and update fused into one jit graph.

Parity target: algo/ppo/frozen_ppo.py (rl_games-derived PPO, SURVEY.md §2.3):
asymmetric actor-critic with privileged encoder, horizon-64 rollouts, GAE
(γ 0.99, τ 0.95), ratio clip 0.2, clipped value loss ×0.5×critic_coef 4,
bounds loss 1e-4, entropy 0, grad-norm clip 1, adaptive-KL scheduler present
but disabled (frozen_ppo.py:630), obs/priv/value RunningMeanStd, value
bootstrap on timeout (reward×0.01 + γV, frozen_ppo.py:677-683 — a reference
quirk preserved behind `value_bootstrap`), minibatch_size = batch/mini_epochs
(frozen_ppo.py:215 quirk).

TPU design: the env rollout is a `lax.scan` over the jitted env step — sim,
observation pipeline, policy, GAE and all 8 mini-epochs run in ONE compiled
program per epoch; the only host work is metric logging. Data parallelism is
GSPMD: env-batch arrays carry a `dp` sharding, params are replicated, XLA
emits the gradient psum (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..envs import insertion
from ..envs.config import TaskConfig
from ..models.actor_critic import (
    ActorCriticSplit,
    gaussian_neglogp,
    policy_kl,
    sample_actions,
)
from ..models.running_mean_std import RMSState, rms_init, rms_normalize, rms_update


@dataclass(frozen=True)
class PPOConfig:
    horizon: int = 64
    mini_epochs: int = 8
    gamma: float = 0.99
    tau: float = 0.95
    e_clip: float = 0.2
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 0.0001
    grad_norm: float = 1.0
    learning_rate: float = 2.5e-4
    kl_threshold: float = 0.02
    # "fixed" (reference default: AdaptiveScheduler present but disabled,
    # frozen_ppo.py:630) | "kl" (AdaptiveScheduler semantics, frozen_ppo.py:
    # 864-877: kl > 2·thr → lr/1.5, kl < thr/2 → lr·1.5, clamped [1e-6, 1e-2]).
    # Deviation when enabled: the reference updates per optimizer step on the
    # minibatch KL; here the update is applied once per epoch on the
    # epoch-mean KL (the fused-epoch design keeps the LR constant in-graph),
    # so the adaptation reacts one epoch later and with a smoother signal.
    lr_schedule: str = "fixed"
    # Eval-gated anneal ladder (trainer-side; no reference counterpart — the
    # reference's PhysX near-rigid grasp does not exhibit the hover-collapse
    # this counters): when eval success declines from its best for
    # `anneal_patience` consecutive evals, restore the best-eval checkpoint,
    # multiply the LR by `anneal_decay` (floored at `anneal_min_lr`) and
    # re-init Adam moments. Requires an inject_hyperparams optimizer, which
    # `build` selects automatically when this flag is on.
    anneal_ladder: bool = False
    anneal_decay: float = 0.5
    anneal_patience: int = 2
    anneal_min_lr: float = 1e-6
    # evals within `anneal_margin` of the best don't count as declines
    # (finite-eval success noise: sigma ~ sqrt(p(1-p)/eval_envs))
    anneal_margin: float = 0.02
    # Anchor regularizer (anti-collapse lever, no reference counterpart):
    # when > 0, adds anchor_coef * KL(π_new ‖ π_anchor) to the loss, where
    # π_anchor is a frozen policy snapshot carried in PPOState.anchor_params
    # (initialized to the starting params; the trainer re-points it at the
    # banked best-eval policy on every new eval best / ladder restore). This
    # bounds post-peak drift from the peak policy instead of merely rewinding
    # to it, so fine-tune phases can keep exploring without forgetting.
    anchor_coef: float = 0.0
    value_bootstrap: bool = True
    # ablation (round-4, VERDICT r3 item 2): suppress the γV timeout
    # bootstrap on currently-inserted (success) states. The reference always
    # bootstraps V(s_t) at the time limit (frozen_ppo.py:677-683); for
    # success states that target is the critic's own inflated estimate of an
    # absorbing goal — the suspect behind diag/value_error_success ≈ 4×
    # value_error_fail. No reference counterpart; off by default.
    bootstrap_mask_success: bool = False
    # Post-restore critic warmup (fine-tune lever, no reference counterpart):
    # while agent_steps < critic_warmup_steps, only critic_mlp/value-head
    # gradients are applied (actor_mlp, mu, log_std, priv_mlp frozen), so the
    # value function re-fits to changed targets (e.g. bootstrap_mask_success
    # rescales timeout targets) before any policy update. Round-4 phase-G
    # showed why: restoring an 0.84 teacher into masked targets with a live
    # actor destroyed it within the first 10M steps (eval 0.84 -> 0.41).
    critic_warmup_steps: float = 0.0
    # During the warmup window, also freeze the obs/priv normalizers so the
    # restored actor is frozen BEHAVIORALLY, not just in parameters (round-4
    # ADVICE: rms stats drifting under a frozen actor still shift its
    # effective actions; negligible for a converged-RMS restore, but strict
    # freezing costs nothing). value_rms keeps updating — the critic refit
    # needs it.
    warmup_freeze_rms: bool = True
    normalize_input: bool = True
    normalize_value: bool = True
    normalize_advantage: bool = True
    clip_value: bool = True
    max_agent_steps: float = 1.5e9

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class PPOState(NamedTuple):
    params: Any
    opt_state: Any
    obs_rms: RMSState
    priv_rms: RMSState
    value_rms: RMSState
    env_state: insertion.EnvState
    rng: jax.Array
    epoch: jax.Array        # scalar i32
    agent_steps: jax.Array  # scalar i64-ish f32
    # frozen policy snapshot for the anchor-KL loss (None when anchor_coef=0)
    anchor_params: Any = None


class Transition(NamedTuple):
    obs: jax.Array
    priv: jax.Array
    actions: jax.Array
    neglogp: jax.Array
    values: jax.Array
    rewards: jax.Array
    dones: jax.Array
    mu: jax.Array
    sigma: jax.Array
    succ: jax.Array  # engaged-success flag, for collapse diagnostics only


def build(cfg_task: TaskConfig, ppo_cfg: PPOConfig, model, subs, n_envs: int, rng,
          grasp_data=None):
    """Construct network, initial PPOState and the jitted train_epoch fn.

    `grasp_data` (envs/grasp_gen.GraspData) selects dataset-driven resets —
    the reference's default `_reset_predefined_environment` path replaying
    initial_grasp_data rows (factory_task_insertion.py:1223-1241)."""
    obs_dim = cfg_task.env.num_obs_hist * cfg_task.env.num_observations
    net = ActorCriticSplit(
        num_actions=cfg_task.env.num_actions,
        obs_dim=obs_dim,
        priv_dim=cfg_task.env.num_states,
    )
    k_env, k_net, k_train = jax.random.split(rng, 3)
    env_state = insertion.reset_all(cfg_task, model, subs, k_env, n_envs,
                                    grasp_data=grasp_data)
    dummy_obs = jnp.zeros((1, obs_dim))
    dummy_priv = jnp.zeros((1, cfg_task.env.num_states))
    params = net.init(k_net, dummy_obs, dummy_priv)

    if ppo_cfg.lr_schedule == "kl" or ppo_cfg.anneal_ladder:
        tx = optax.chain(
            optax.clip_by_global_norm(ppo_cfg.grad_norm),
            optax.inject_hyperparams(optax.adam)(
                learning_rate=ppo_cfg.learning_rate
            ),
        )
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(ppo_cfg.grad_norm),
            optax.adam(ppo_cfg.learning_rate),
        )
    state = PPOState(
        params=params,
        opt_state=tx.init(params),
        obs_rms=rms_init((obs_dim,)),
        priv_rms=rms_init((cfg_task.env.num_states,)),
        value_rms=rms_init(()),
        env_state=env_state,
        rng=k_train,
        epoch=jnp.zeros((), jnp.int32),
        agent_steps=jnp.zeros((), jnp.float32),
        anchor_params=params if ppo_cfg.anchor_coef > 0 else None,
    )
    train_epoch = make_train_epoch(cfg_task, ppo_cfg, model, subs, net, tx,
                                   grasp_data=grasp_data)
    return net, tx, state, train_epoch


def make_act_fn(cfg_task: TaskConfig, net):
    """Inference policy: obs_dict → clamped deterministic actions (test path)."""

    def act(params, obs_rms, priv_rms, obs, priv):
        o = rms_normalize(obs_rms, obs)
        p = rms_normalize(priv_rms, priv)
        mu, _, _, _, _ = net.apply(params, o, p)
        return jnp.clip(mu, -1.0, 1.0)

    return act


def make_train_epoch(cfg_task, ppo_cfg: PPOConfig, model, subs, net, tx,
                     grasp_data=None):
    env_step = partial(insertion.step, cfg_task, model, subs, grasp_data=grasp_data)

    def rollout_step(carry, _):
        env_state, params, obs_rms, priv_rms, value_rms, rng = carry
        rng, k_act = jax.random.split(rng)
        obs = env_state.obs_queue
        # pre-step success flag: diag/value_error_success splits V(s_t) error
        # by s_t's own label, not s_{t+1}'s (round-3 ADVICE: one-step skew)
        succ_pre = env_state.success_reset_buf.astype(jnp.float32)
        priv = insertion.priv_info_of(cfg_task, model, env_state)
        o = rms_normalize(obs_rms, obs)
        p = rms_normalize(priv_rms, priv)
        mu, log_std, value_n, _, _ = net.apply(params, o, p)
        actions, neglogp = sample_actions(mu, log_std, k_act)
        value = _unnorm_value(ppo_cfg, value_rms, value_n)
        clamped = jnp.clip(actions, -1.0, 1.0)
        env_state, out = env_step(env_state, clamped)
        if ppo_cfg.value_bootstrap:
            boot = out.timeout.astype(out.rew.dtype)
            if ppo_cfg.bootstrap_mask_success:
                boot = boot * (1.0 - env_state.success_reset_buf.astype(out.rew.dtype))
            shaped = 0.01 * out.rew + ppo_cfg.gamma * value * boot
        else:
            shaped = out.rew
        tr = Transition(
            obs=obs, priv=priv, actions=actions, neglogp=neglogp, values=value,
            rewards=shaped, dones=out.reset.astype(jnp.float32), mu=mu,
            sigma=jnp.exp(log_std) * jnp.ones_like(mu),
            succ=succ_pre,
        )
        metrics = {
            "reward": jnp.mean(out.rew),
            "success": jnp.mean(out.extras["successes"]),
            "dones": jnp.sum(out.reset.astype(jnp.float32)),
            # render-on-demand starvation (rows/step that kept a stale frame
            # past capacity); visible in TB so a starved config is loud
            "render_overflow": out.extras["render_overflow"][0],
        }
        return (env_state, params, obs_rms, priv_rms, value_rms, rng), (tr, metrics)

    def train_epoch(state: PPOState):
        # ---------------- rollout (lax.scan, horizon T)
        carry = (state.env_state, state.params, state.obs_rms, state.priv_rms,
                 state.value_rms, state.rng)
        carry, (traj, roll_metrics) = jax.lax.scan(
            rollout_step, carry, None, length=ppo_cfg.horizon
        )
        env_state, _, _, _, _, rng = carry

        # bootstrap value for the final state
        obs_last = env_state.obs_queue
        priv_last = insertion.priv_info_of(cfg_task, model, env_state)
        o = rms_normalize(state.obs_rms, obs_last)
        p = rms_normalize(state.priv_rms, priv_last)
        _, _, last_value_n, _, _ = net.apply(state.params, o, p)
        last_value = _unnorm_value(ppo_cfg, state.value_rms, last_value_n)

        # ---------------- GAE (experience.py:242-255)
        def gae_step(carry, tr_t):
            adv_next, v_next, nd_next = carry
            delta = tr_t.rewards + ppo_cfg.gamma * v_next * nd_next - tr_t.values
            adv = delta + ppo_cfg.gamma * ppo_cfg.tau * nd_next * adv_next
            return (adv, tr_t.values, 1.0 - tr_t.dones), adv

        (_, _, _), advs = jax.lax.scan(
            gae_step,
            (jnp.zeros_like(last_value), last_value, 1.0 - traj.dones[-1]),
            traj,
            reverse=True,
        )
        returns = advs + traj.values

        # ---------------- normalizer updates (batch-level)
        obs_rms = rms_update(state.obs_rms, traj.obs) if ppo_cfg.normalize_input else state.obs_rms
        priv_rms = rms_update(state.priv_rms, traj.priv) if ppo_cfg.normalize_input else state.priv_rms
        value_rms = rms_update(state.value_rms, returns) if ppo_cfg.normalize_value else state.value_rms
        if ppo_cfg.critic_warmup_steps > 0 and ppo_cfg.warmup_freeze_rms:
            # strict behavioral freeze of the actor during critic warmup
            # (PPOConfig.warmup_freeze_rms): keep the old obs/priv stats
            # while agent_steps < critic_warmup_steps
            warm_rms = state.agent_steps < ppo_cfg.critic_warmup_steps
            keep = lambda old, new: jax.tree_util.tree_map(
                lambda o, n: jnp.where(warm_rms, o, n), old, new)
            obs_rms = keep(state.obs_rms, obs_rms)
            priv_rms = keep(state.priv_rms, priv_rms)

        returns_n = rms_normalize(value_rms, returns, clip=1e6) if ppo_cfg.normalize_value else returns
        values_n = rms_normalize(value_rms, traj.values, clip=1e6) if ppo_cfg.normalize_value else traj.values

        # flatten [T, N, ...] → [B, ...]
        def fl(x):
            return x.reshape((-1,) + x.shape[2:])

        batch = dict(
            obs=fl(traj.obs), priv=fl(traj.priv), actions=fl(traj.actions),
            neglogp=fl(traj.neglogp), values=fl(values_n), returns=fl(returns_n),
            advs=fl(advs), mu=fl(traj.mu), sigma=fl(traj.sigma),
        )
        if ppo_cfg.normalize_advantage:
            a = batch["advs"]
            batch["advs"] = (a - jnp.mean(a)) / (jnp.std(a) + 1e-8)

        # ---------------- collapse diagnostics (VERDICT r2: root-cause the
        # post-peak collapse rather than only countering it). Split the value
        # error and advantages by inserted-vs-not states: if the critic
        # diverges specifically on success states (suspect: the 0.01-reward
        # timeout bootstrap quirk, frozen_ppo.py:677-683), these curves show
        # it at the collapse point.
        succ_m = traj.succ
        fail_m = 1.0 - succ_m
        n_s = jnp.sum(succ_m) + 1e-8
        n_f = jnp.sum(fail_m) + 1e-8
        verr = returns - traj.values  # unnormalized TD(λ) value error
        diag = {
            "diag/value_error_abs": jnp.mean(jnp.abs(verr)),
            "diag/value_error_success": jnp.sum(jnp.abs(verr) * succ_m) / n_s,
            "diag/value_error_fail": jnp.sum(jnp.abs(verr) * fail_m) / n_f,
            "diag/adv_success": jnp.sum(advs * succ_m) / n_s,
            "diag/adv_fail": jnp.sum(advs * fail_m) / n_f,
            "diag/adv_std": jnp.std(advs),
            "diag/success_state_frac": jnp.mean(succ_m),
            "diag/value_mean": jnp.mean(traj.values),
            "diag/return_mean": jnp.mean(returns),
        }

        B = ppo_cfg.horizon * traj.obs.shape[1]
        # reference quirk: minibatch = batch // mini_epochs (frozen_ppo.py:215)
        mb_size = B // ppo_cfg.mini_epochs
        n_mb = B // mb_size

        def loss_fn(params, mb):
            o = rms_normalize(obs_rms, mb["obs"])
            p = rms_normalize(priv_rms, mb["priv"])
            mu, log_std, value, _, _ = net.apply(params, o, p)
            neglogp = gaussian_neglogp(mb["actions"], mu, log_std)
            ratio = jnp.exp(mb["neglogp"] - neglogp)
            surr1 = mb["advs"] * ratio
            surr2 = mb["advs"] * jnp.clip(ratio, 1.0 - ppo_cfg.e_clip, 1.0 + ppo_cfg.e_clip)
            a_loss = jnp.mean(jnp.maximum(-surr1, -surr2))

            if ppo_cfg.clip_value:
                v_clipped = mb["values"] + jnp.clip(
                    value - mb["values"], -ppo_cfg.e_clip, ppo_cfg.e_clip
                )
                v_loss = jnp.maximum(
                    jnp.square(value - mb["returns"]), jnp.square(v_clipped - mb["returns"])
                )
            else:
                v_loss = jnp.square(value - mb["returns"])
            c_loss = jnp.mean(v_loss)

            entropy = jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e))
            mu_excess = jnp.clip(mu - 1.1, 0.0) ** 2 + jnp.clip(mu + 1.1, None, 0.0) ** 2
            b_loss = jnp.mean(jnp.sum(mu_excess, axis=-1))

            loss = (
                a_loss
                + 0.5 * c_loss * ppo_cfg.critic_coef
                - entropy * ppo_cfg.entropy_coef
                + b_loss * ppo_cfg.bounds_loss_coef
            )
            kl = policy_kl(mu, jnp.exp(log_std) * jnp.ones_like(mu), mb["mu"], mb["sigma"])
            clip_frac = jnp.mean((jnp.abs(ratio - 1.0) > ppo_cfg.e_clip).astype(jnp.float32))
            aux = {"a_loss": a_loss, "c_loss": c_loss, "b_loss": b_loss, "kl": kl,
                   "diag/entropy": entropy, "diag/clip_frac": clip_frac}
            if ppo_cfg.anchor_coef > 0:
                mu_a, log_std_a, _, _, _ = net.apply(state.anchor_params, o, p)
                kl_anchor = policy_kl(
                    mu, jnp.exp(log_std) * jnp.ones_like(mu),
                    jax.lax.stop_gradient(mu_a),
                    jnp.exp(log_std_a) * jnp.ones_like(mu_a),
                )
                loss = loss + ppo_cfg.anchor_coef * kl_anchor
                aux["kl_anchor"] = kl_anchor
            return loss, aux

        if ppo_cfg.critic_warmup_steps > 0:
            # critic-only phase: zero every non-critic gradient while
            # agent_steps < critic_warmup_steps (see PPOConfig docstring).
            warm = state.agent_steps < ppo_cfg.critic_warmup_steps

            def _freeze_actor(grads):
                def mask(path, g):
                    keys = [getattr(p, "key", None) for p in path]
                    is_critic = ("critic_mlp" in keys) or ("value" in keys)
                    return g if is_critic else jnp.where(warm, 0.0, g)

                return jax.tree_util.tree_map_with_path(mask, grads)
        else:
            def _freeze_actor(grads):
                return grads

        def mb_update(carry, idx):
            params, opt_state = carry
            mb = jax.tree_util.tree_map(lambda x: x[idx], batch)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb)
            grads = _freeze_actor(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux["loss"] = loss
            return (params, opt_state), aux

        def epoch_body(carry, k):
            params, opt_state, rng = carry
            rng, kp = jax.random.split(rng)
            perm = jax.random.permutation(kp, B).reshape(n_mb, mb_size)
            (params, opt_state), aux = jax.lax.scan(mb_update, (params, opt_state), perm)
            aux = jax.tree_util.tree_map(jnp.mean, aux)
            return (params, opt_state, rng), aux

        (params, opt_state, rng), aux = jax.lax.scan(
            epoch_body, (state.params, state.opt_state, rng), None,
            length=ppo_cfg.mini_epochs,
        )
        aux = jax.tree_util.tree_map(jnp.mean, aux)
        roll = jax.tree_util.tree_map(jnp.mean, roll_metrics)
        metrics = {**aux, **diag, **{f"episode/{k}": v for k, v in roll.items()}}

        if ppo_cfg.lr_schedule == "kl":
            # AdaptiveScheduler.update (frozen_ppo.py:864-877), applied
            # per-epoch on the epoch-mean KL
            inj = opt_state[1]
            cur = inj.hyperparams["learning_rate"]
            thr = ppo_cfg.kl_threshold
            new_lr = jnp.where(aux["kl"] > 2.0 * thr, cur / 1.5,
                               jnp.where(aux["kl"] < 0.5 * thr, cur * 1.5, cur))
            new_lr = jnp.clip(new_lr, 1e-6, 1e-2)
            hp = dict(inj.hyperparams)
            hp["learning_rate"] = new_lr
            opt_state = (opt_state[0], inj._replace(hyperparams=hp)) + tuple(opt_state[2:])
            metrics["info/lr"] = new_lr

        n_envs = traj.obs.shape[1]
        new_state = PPOState(
            params=params,
            opt_state=opt_state,
            obs_rms=obs_rms,
            priv_rms=priv_rms,
            value_rms=value_rms,
            env_state=env_state,
            rng=rng,
            epoch=state.epoch + 1,
            agent_steps=state.agent_steps + ppo_cfg.horizon * n_envs,
            anchor_params=state.anchor_params,
        )
        return new_state, metrics

    return train_epoch


def _unnorm_value(ppo_cfg, value_rms, v):
    from ..models.running_mean_std import rms_unnormalize

    return rms_unnormalize(value_rms, v) if ppo_cfg.normalize_value else v
