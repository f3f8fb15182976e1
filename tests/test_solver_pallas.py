"""Fused Pallas solver vs reference XLA solver parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgyminsertion_tpu.physics.solver import (
    ContactSet,
    position_correction,
    solve_contacts,
)
from isaacgyminsertion_tpu.physics.solver_pallas import solve_contacts_fused


def _random_contacts(key, n=5, c=37):
    ks = jax.random.split(key, 10)
    r = jax.random.normal(ks[0], (n, c, 3)) * 0.05
    nrm = jax.random.normal(ks[1], (n, c, 3))
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    depth = jax.random.uniform(ks[2], (n, c), minval=-0.01, maxval=0.005)
    v_other = jnp.zeros((n, c, 3)).at[:, :3].set(
        jax.random.normal(ks[3], (n, 3, 3)) * 0.05
    )
    mu = jax.random.uniform(ks[4], (n, c), minval=0.2, maxval=1.0)
    weight = jax.random.uniform(ks[5], (n, c), minval=0.5, maxval=1.5)
    stiffness = jnp.zeros((n, c)).at[:, :3].set(3500.0)
    cs = ContactSet(r=r, n=nrm, depth=depth, v_other=v_other, mu=mu,
                    weight=weight, stiffness=stiffness)
    mass = jax.random.uniform(ks[6], (n,), minval=0.05, maxval=1.0)
    I_diag = jax.random.uniform(ks[7], (n, 3), minval=1e-5, maxval=1e-3)
    I_inv = jnp.stack([jnp.diag(1.0 / d) for d in I_diag])
    v = jax.random.normal(ks[8], (n, 3)) * 0.3
    w = jax.random.normal(ks[9], (n, 3)) * 1.0
    return mass, I_inv, v, w, cs


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_reference(seed):
    h = 1.0 / 180.0
    mass, I_inv, v, w, cs = _random_contacts(jax.random.PRNGKey(seed))
    ref = solve_contacts(mass, I_inv, v, w, cs, h, iters=16, beta=0.0)
    dx_ref, dth_ref = position_correction(mass, I_inv, cs)
    fused = solve_contacts_fused(mass, I_inv, v, w, cs, h, interpret=True)

    # summation order differs between the fused per-component sums and the
    # reference einsums; across 16 iterations with discontinuous friction-cone
    # projections tiny fp deltas grow to ~1e-3 — physically negligible
    np.testing.assert_allclose(np.asarray(fused.v), np.asarray(ref.v),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(fused.w), np.asarray(ref.w),
                               rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(fused.lam_n), np.asarray(ref.lam_n),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.lam_t), np.asarray(ref.lam_t),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fused.dx), np.asarray(dx_ref),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.dth), np.asarray(dth_ref),
                               rtol=5e-3, atol=1e-3)
