"""Rollout video / FT-trace capture (parity: factory_env_insertion.py:1211-1265
record_video/record_ft + frozen_ppo.py:791-851 mp4 logging).

Captures depth-camera or tactile frames during an evaluation rollout and
writes gif/mp4 via imageio, plus matplotlib action/force trace plots — the
observability surface the reference attaches to TensorBoard runs.
"""

from __future__ import annotations

import os

import numpy as np


def frames_to_video(frames: np.ndarray, path: str, fps: int = 30):
    """frames: [T, H, W] float depth/gray or [T, H, W, 3] rgb in [0, 1]."""
    import imageio

    f = np.asarray(frames)
    if f.ndim == 3:
        f = np.stack([f] * 3, axis=-1)
    f = (np.clip(f, 0.0, 1.0) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if path.endswith(".gif"):
        imageio.mimsave(path, list(f), fps=fps)
    else:
        imageio.mimwrite(path, list(f), fps=fps)
    return path


def plot_traces(traces: dict[str, np.ndarray], path: str, title: str = ""):
    """Action / fingertip-force trace plot (record_ft parity)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(len(traces), 1, figsize=(8, 2.2 * len(traces)), squeeze=False)
    for ax, (name, arr) in zip(axes[:, 0], traces.items()):
        arr = np.asarray(arr)
        if arr.ndim == 1:
            arr = arr[:, None]
        for i in range(arr.shape[1]):
            ax.plot(arr[:, i], lw=0.8)
        ax.set_ylabel(name)
        ax.grid(alpha=0.3)
    if title:
        axes[0, 0].set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def record_eval_video(cfg_task, model, subs, act_fn, n_steps: int = 120,
                      out_dir: str = "videos", seed: int = 0):
    """Run one env with the depth camera on and capture frames + traces."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ..envs import insertion

    cfg = cfg_task.replace(env=dataclasses.replace(
        cfg_task.env, external_cam=True, depth_cam=True, seg_cam=True))
    state = insertion.reset_all(cfg, model, subs, jax.random.PRNGKey(seed), 1)
    step = jax.jit(lambda s, a: insertion.step(cfg, model, subs, s, a))
    frames, actions, forces = [], [], []
    for _ in range(n_steps):
        a = act_fn(state)
        state, out = step(state, a)
        frames.append(-np.asarray(out.img[0, 0]))  # depth is negative-normalized
        actions.append(np.asarray(a[0]))
        forces.append(np.asarray(state.finger_forces_ema[0]))
    paths = [
        frames_to_video(np.stack(frames), os.path.join(out_dir, "rollout.gif")),
        plot_traces({"actions": np.stack(actions), "finger_forces": np.stack(forces)},
                    os.path.join(out_dir, "traces.png")),
    ]
    return paths
