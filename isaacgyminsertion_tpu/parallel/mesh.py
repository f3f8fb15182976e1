"""Device-mesh / sharding helpers: the TPU-native replacement for the
reference's manual NCCL data-parallel wiring (SURVEY.md §2.7).

The reference broadcasts params and all-reduces grads by hand over
torch.distributed (frozen_ppo.py:377-381, 586-603). Here the same strategy is
*declarative*: envs are sharded over the mesh's `dp` axis, params are
replicated, and XLA inserts the psum for gradients (over ICI in a slice, DCN
across slices) because the loss is a mean over the global batch. No
communication library surface at all.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_env_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard every leaf's leading (env) axis over the mesh; scalars replicate."""

    def put(x):
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape[axis] == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
