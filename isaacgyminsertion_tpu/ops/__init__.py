from . import rotations, sdf, control  # noqa: F401

import functools

import jax


def f32_matmul(fn):
    """Run `fn` under float32 matmul precision.

    TPU's default matmul precision computes einsum/dot in bfloat16, which is
    fatal for the physics pipeline (quaternion-algebra einsums, mass-matrix
    contractions, contact solves): at 1024 envs a bf16-precision env NaN'd
    within 23 steps. Physics entry points wrap in this scope; neural-net
    compute stays on the fast default path.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
