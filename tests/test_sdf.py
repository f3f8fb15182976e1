"""Tests for analytic SDF library: sign, exact distances, normals."""

import numpy as np
import jax
import jax.numpy as jnp

from isaacgyminsertion_tpu.ops import sdf


def onehot(kind):
    return jnp.eye(sdf.NUM_KINDS)[kind]


def test_circle_exact():
    p = jnp.asarray([[0.03, 0.0], [0.0, 0.0], [0.0, 0.01]])
    d = sdf.sd_circle(p, jnp.float32(0.02), jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(d), [0.01, -0.02, -0.01], atol=1e-6)


def test_box2d_exact():
    d = sdf.sd_box2d(jnp.asarray([[0.03, 0.0], [0.0, 0.0]]), jnp.float32(0.01), jnp.float32(0.02))
    np.testing.assert_allclose(np.asarray(d), [0.02, -0.01], atol=1e-6)


def test_hexagon_sign():
    hx = jnp.float32(0.017)  # apothem
    inside = sdf.sd_hexagon(jnp.asarray([[0.0, 0.0]]), hx, hx)
    on_flat = sdf.sd_hexagon(jnp.asarray([[0.0, 0.017]]), hx, hx)
    outside = sdf.sd_hexagon(jnp.asarray([[0.05, 0.0]]), hx, hx)
    assert float(inside[0]) < -0.01
    assert abs(float(on_flat[0])) < 1e-5
    assert float(outside[0]) > 0.01


def test_ellipse_axes_exact():
    a, b = jnp.float32(0.0175), jnp.float32(0.025)
    d = sdf.sd_ellipse(jnp.asarray([[0.0275, 0.0], [0.0, 0.035], [0.0, 0.0]]), a, b)
    np.testing.assert_allclose(np.asarray(d)[:2], [0.01, 0.01], atol=1e-5)
    assert float(d[2]) < -0.01


def test_triangle_inside_outside():
    hx, hy = jnp.float32(0.024), jnp.float32(0.021)
    d_in = sdf.sd_triangle_iso(jnp.asarray([[0.0, -0.01]]), hx, hy)
    d_out = sdf.sd_triangle_iso(jnp.asarray([[0.1, 0.0]]), hx, hy)
    assert float(d_in[0]) < 0 < float(d_out[0])


def test_trapezoid_contains_center():
    hx, hy = jnp.float32(0.015), jnp.float32(0.03)
    assert float(sdf.sd_trapezoid(jnp.asarray([[0.0, 0.0]]), hx, hy)[0]) < 0
    assert float(sdf.sd_trapezoid(jnp.asarray([[0.05, 0.0]]), hx, hy)[0]) > 0


def test_plug_sdf_cylinder():
    oh = onehot(sdf.KIND_CIRCLE)[None]
    hx = jnp.full((1,), 0.0254)
    L = jnp.full((1,), 0.0762)
    # inside mid-shaft
    d = sdf.plug_sdf(jnp.asarray([[0.0, 0.0, 0.04]]), oh, hx, hx, L)
    np.testing.assert_allclose(float(d[0]), -0.0254, atol=1e-6)
    # above the tip
    d = sdf.plug_sdf(jnp.asarray([[0.0, 0.0, 0.09]]), oh, hx, hx, L)
    np.testing.assert_allclose(float(d[0]), 0.0138, atol=1e-4)
    # beside the shaft
    d = sdf.plug_sdf(jnp.asarray([[0.04, 0.0, 0.03]]), oh, hx, hx, L)
    np.testing.assert_allclose(float(d[0]), 0.0146, atol=1e-4)


def test_socket_sdf_hole():
    oh = onehot(sdf.KIND_CIRCLE)[None]
    args = (oh, jnp.full((1,), 0.0255), jnp.full((1,), 0.0255), jnp.full((1,), 0.01),
            jnp.full((1,), 0.0508), jnp.full((1,), 0.0457))
    # center of the hole: outside the solid (air)
    d_hole = sdf.socket_sdf(jnp.asarray([[0.0, 0.0, 0.005]]), *args)
    assert float(d_hole[0]) > 0
    # inside the plate material
    d_mat = sdf.socket_sdf(jnp.asarray([[0.038, 0.0, 0.005]]), *args)
    assert float(d_mat[0]) < 0
    # above the plate
    d_above = sdf.socket_sdf(jnp.asarray([[0.038, 0.0, 0.02]]), *args)
    np.testing.assert_allclose(float(d_above[0]), 0.01, atol=1e-5)


def test_normals_unit():
    oh = jnp.tile(onehot(sdf.KIND_BOX)[None], (5, 1))
    hx = jnp.full((5,), 0.016)
    hy = jnp.full((5,), 0.01)
    L = jnp.full((5,), 0.0762)
    p = jax.random.normal(jax.random.PRNGKey(0), (5, 3)) * 0.05
    n = sdf.sdf_normal(sdf.plug_sdf, p, oh, hx, hy, L)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, atol=1e-4)


def test_section_blend_matches_individual():
    p = jax.random.normal(jax.random.PRNGKey(1), (8, 2)) * 0.03
    hx = jnp.full((8,), 0.02)
    hy = jnp.full((8,), 0.015)
    for k, fn in enumerate([sdf.sd_circle, sdf.sd_box2d, sdf.sd_hexagon,
                            sdf.sd_ellipse, sdf.sd_trapezoid, sdf.sd_triangle_iso]):
        oh = jnp.tile(onehot(k)[None], (8, 1))
        np.testing.assert_allclose(
            np.asarray(sdf.section_sdf(p, oh, hx, hy)), np.asarray(fn(p, hx, hy)), atol=1e-6
        )
