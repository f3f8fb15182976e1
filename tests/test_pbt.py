"""PBT replacement-algorithm semantics tests (pbt/pbt.py parity, SURVEY.md §8.1)."""

import dataclasses

import numpy as np
import pytest

from isaacgyminsertion_tpu.pbt import PbtMember, PbtParams, mutate, pbt_update
from isaacgyminsertion_tpu.pbt.pbt import load_population, save_pbt_checkpoint


def _member(idx, obj, it=1, hp=None, w=None):
    return PbtMember(policy_idx=idx, iteration=it, true_objective=obj,
                     hparams=hp or {"learning_rate": 1e-3, "e_clip": 0.2},
                     weights=w or {"w": np.ones(3) * idx})


def _params(tmp_path, **kw):
    return PbtParams(workspace=str(tmp_path), num_policies=4,
                     start_after_steps=0, initial_delay_steps=0, **kw)


def test_population_roundtrip(tmp_path):
    p = _params(tmp_path)
    for i, obj in enumerate([1.0, 2.0, 3.0, 0.5]):
        save_pbt_checkpoint(p, _member(i, obj))
    pop = load_population(p)
    assert len(pop) == 4 and pop[2].true_objective == 3.0


def test_bottom_policy_replaced_by_top(tmp_path):
    p = _params(tmp_path)
    for i, obj in enumerate([10.0, 9.0, 8.0]):
        save_pbt_checkpoint(p, _member(i, obj))
    me = _member(3, 0.1)
    new_hp, new_w, replaced = pbt_update(p, me, steps_since_restart=1e9, total_steps=1e9)
    assert replaced and new_w is not None
    # weights come from one of the top policies (idx 0, by replace_fraction 0.3)
    assert float(new_w["w"][0]) in (0.0,)
    assert set(new_hp) == set(me.hparams)


def test_top_policy_not_replaced(tmp_path):
    p = _params(tmp_path)
    for i, obj in enumerate([1.0, 2.0, 3.0]):
        save_pbt_checkpoint(p, _member(i, obj))
    me = _member(3, 5.0)  # best of all
    _, new_w, replaced = pbt_update(p, me, 1e9, 1e9)
    assert not replaced and new_w is None


def test_no_replacement_before_start_steps(tmp_path):
    p = PbtParams(workspace=str(tmp_path), num_policies=4,
                  start_after_steps=1e6, initial_delay_steps=1e6)
    for i, obj in enumerate([10.0, 9.0, 8.0]):
        save_pbt_checkpoint(p, _member(i, obj))
    _, new_w, replaced = pbt_update(p, _member(3, 0.1), steps_since_restart=10,
                                    total_steps=10)
    assert not replaced


def test_threshold_blocks_marginal_replacement(tmp_path):
    p = _params(tmp_path, replace_threshold_frac_absolute=10.0)
    for i, obj in enumerate([1.001, 1.0005, 1.0002]):
        save_pbt_checkpoint(p, _member(i, obj))
    # delta is tiny vs the absolute threshold ⇒ mutate hparams only
    new_hp, new_w, replaced = pbt_update(p, _member(3, 1.0), 1e9, 1e9)
    assert not replaced and new_w is None


def test_mutation_ranges():
    hp = {"learning_rate": 1e-3, "e_clip": 0.2, "mini_epochs": 8}
    for _ in range(100):
        out = mutate(hp, mutation_rate=1.0)
        assert 0.01 <= out["e_clip"] <= 0.3
        assert 1 <= out["mini_epochs"] <= 16
        assert out["learning_rate"] > 0


def test_pbt_driver_population_roundrobin(tmp_path):
    """In-process PBT driver: population trains, checkpoints, and exchanges."""
    import jax

    from isaacgyminsertion_tpu.algo.ppo import PPOConfig
    from isaacgyminsertion_tpu.assets import build_subassembly_set
    from isaacgyminsertion_tpu.envs.config import default_task_config
    from isaacgyminsertion_tpu.pbt.driver import run_pbt_population
    from isaacgyminsertion_tpu.physics.robot import build_kuka_openhand

    members = run_pbt_population(
        default_task_config(), PPOConfig(horizon=2, mini_epochs=2),
        build_kuka_openhand(), build_subassembly_set(), n_envs=4,
        pbt_params=PbtParams(num_policies=2, workspace=str(tmp_path),
                             start_after_steps=0, initial_delay_steps=0),
        epochs_per_interval=1, intervals=2,
    )
    assert len(members) == 2
    import glob

    assert len(glob.glob(str(tmp_path / "p*.pbt"))) >= 2
    for m in members:
        assert np.isfinite(m["objective"])
