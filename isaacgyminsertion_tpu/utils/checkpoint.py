"""Checkpoint save/restore with best-reward/best-success rotation.

Parity: frozen_ppo.py:437-463, 780-786 — periodic `last` checkpoints plus
`best_reward`/`best_success` snapshots that replace the previous best; the
checkpoint carries model params + all RunningMeanStd states (+ counters) as
one pytree, like the reference's torch .pth dicts. The resolved config is
dumped alongside (train.py:130-133 parity).

Format: pickled host (numpy) pytrees — NamedTuple/dict structure preserved,
restorable on any backend without sharding metadata (the states are MBs; for
multi-slice sharded states orbax is available and the save path is pluggable).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pickle
from typing import Any

import jax


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: jax.device_get(x), tree)


class Checkpointer:
    def __init__(self, out_dir: str):
        self.out_dir = os.path.abspath(out_dir)
        os.makedirs(self.out_dir, exist_ok=True)
        self.best_reward = float("-inf")
        self.best_success = float("-inf")

    def _save(self, name: str, tree: Any):
        path = os.path.join(self.out_dir, name + ".ckpt")
        with open(path + ".tmp", "wb") as f:
            pickle.dump(_to_host(tree), f)
        os.replace(path + ".tmp", path)  # atomic: PBT readers never see partial files

    def save_last(self, tree: Any, step: int):
        self._save("last", tree)
        with open(os.path.join(self.out_dir, "last_step.json"), "w") as f:
            json.dump({"step": int(step)}, f)

    def maybe_save_best(self, tree: Any, reward: float, success: float):
        """best-reward / best-success rotation (frozen_ppo.py:437-443,780-786)."""
        saved = []
        if reward > self.best_reward:
            self.best_reward = reward
            self._save("best_reward", tree)
            saved.append("best_reward")
        if success > self.best_success:
            self.best_success = success
            self._save("best_success", tree)
            saved.append("best_success")
        return saved

    def restore(self, name: str) -> Any:
        return restore_path(os.path.join(self.out_dir, name))

    def dump_config(self, cfg: Any, name: str = "config.json"):
        def enc(o):
            if dataclasses.is_dataclass(o):
                return dataclasses.asdict(o)
            return str(o)

        with open(os.path.join(self.out_dir, name), "w") as f:
            json.dump(cfg, f, default=enc, indent=2)


def restore_path(path: str) -> Any:
    """Restore a checkpoint from a path (with or without the .ckpt suffix)."""
    if not path.endswith(".ckpt"):
        path = path + ".ckpt"
    with open(path, "rb") as f:
        return pickle.load(f)
