"""Profiling / determinism aux subsystems (SURVEY.md §5).

The reference's observability is wall-clock FPS meters only (frozen_ppo.py:
279-321); this module makes `jax.profiler` traces first-class and provides
the determinism knob (reference `torch_deterministic`, utils.py:87-117 —
here a seed + same-graph replay check, since jitted TPU programs are
deterministic by construction for fixed seeds and shapes).
"""

from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(out_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    import jax

    os.makedirs(out_dir, exist_ok=True)
    jax.profiler.start_trace(out_dir)
    try:
        yield out_dir
    finally:
        jax.profiler.stop_trace()


def check_determinism(fn, *args, n: int = 2) -> bool:
    """Run `fn(*args)` n times and verify bitwise-identical pytree outputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    ref = jax.tree_util.tree_map(np.asarray, fn(*args))
    for _ in range(n - 1):
        out = jax.tree_util.tree_map(np.asarray, fn(*args))
        leaves_ref = jax.tree_util.tree_leaves(ref)
        leaves_out = jax.tree_util.tree_leaves(out)
        for a, b in zip(leaves_ref, leaves_out):
            if not np.array_equal(a, b, equal_nan=True):
                return False
    return True


class StepTimer:
    """Per-phase step timing with EMA (first-class perf telemetry)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self.ema[name] = (1 - self.alpha) * self.ema.get(name, dt) + self.alpha * dt

    def summary(self) -> dict[str, float]:
        return dict(self.ema)
