"""Batched small-matrix linear algebra, TPU-layout aware.

XLA:TPU lowers `cho_factor`/`linalg.solve` on [N, d, d] batches through a
blocked LAPACK-style path that pads d→128 lanes and serializes pivoting —
for d ≤ 16 it is ~10× off bandwidth (measured 17 ms of a 37 ms physics
substep at N=8192 for the d=15 implicit-PD solve). A fully unrolled
Cholesky on a [d, d, N] layout instead runs ~d³/3 fused elementwise ops on
[N]-wide vectors (N fills the 128-lane axis, zero padding waste) and
needs exactly one read of the matrix batch.

Only valid for SPD matrices (mass matrices + positive diagonal damping, the
IK damped-least-squares normal equations, OSC task-space mass) — no
pivoting.
"""

from __future__ import annotations

import jax.numpy as jnp


def chol_solve_small(lhs, rhs):
    """Solve lhs @ x = rhs for SPD lhs [..., d, d], rhs [..., d] with an
    unrolled Cholesky in [d, d, batch] layout. d must be a small static
    dimension (≤ ~20); batch dims arbitrary."""
    d = lhs.shape[-1]
    batch_shape = lhs.shape[:-2]
    A = jnp.moveaxis(lhs.reshape((-1, d, d)), 0, -1)   # [d, d, N]
    b = jnp.moveaxis(rhs.reshape((-1, d)), 0, -1)      # [d, N]

    L = [[None] * d for _ in range(d)]
    Linv_diag = [None] * d
    for i in range(d):
        s = A[i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        Lii = jnp.sqrt(s)
        L[i][i] = Lii
        inv = 1.0 / Lii
        Linv_diag[i] = inv
        for j in range(i + 1, d):
            s = A[j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv

    # forward substitution L y = b
    y = [None] * d
    for i in range(d):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * Linv_diag[i]

    # backward substitution Lᵀ x = y
    x = [None] * d
    for i in reversed(range(d)):
        s = y[i]
        for k in range(i + 1, d):
            s = s - L[k][i] * x[k]
        x[i] = s * Linv_diag[i]

    out = jnp.stack(x, axis=0)                          # [d, N]
    return jnp.moveaxis(out, 0, -1).reshape(batch_shape + (d,))
