"""isaacgyminsertion_tpu: TPU-native visuotactile insertion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
osheraz/IsaacGymInsertion (RA-L 2025). See ARCHITECTURE.md / PARITY.md.

Top-level surface mirrors the reference package:
    isaacgyminsertion_tpu.make("FactoryTaskInsertionTactile", num_envs=...)
"""

__version__ = "0.1.0"


def make(task_name: str, **kwargs):
    """Create a vectorized task env (reference isaacgyminsertion.make parity)."""
    from .envs.vec_env import make as _make

    return _make(task_name, **kwargs)
