"""Package install (reference setup.py parity)."""

from setuptools import find_packages, setup

setup(
    name="isaacgyminsertion_tpu",
    version="0.1.0",
    description=(
        "TPU-native visuotactile insertion framework (JAX/XLA): batched SDF "
        "physics, on-device tactile/depth sensing, PPO teacher + DAgger "
        "student training in one jit graph"
    ),
    packages=find_packages(include=["isaacgyminsertion_tpu*"]),
    python_requires=">=3.10",
    install_requires=[
        "jax", "flax", "optax", "numpy", "einops",
    ],
    extras_require={
        "logging": ["tensorboardX", "imageio", "matplotlib"],
    },
)
