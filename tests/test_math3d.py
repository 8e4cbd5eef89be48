import jax.numpy as jnp
import numpy as np
import pytest

from garden_tpu.core import math3d as m3


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = m3.quat_normalize(jnp.asarray(rng.normal(size=(32, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    r = m3.quat_to_mat3(q)
    np.testing.assert_allclose(
        m3.quat_rotate(q, v), jnp.einsum("nij,nj->ni", r, v), atol=1e-5
    )


def test_quat_mul_compose():
    qa = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 2)
    qb = m3.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.pi / 2)
    v = jnp.array([0.0, 0.0, 1.0])
    # apply b then a
    expected = m3.quat_rotate(qa, m3.quat_rotate(qb, v))
    got = m3.quat_rotate(m3.quat_mul(qa, qb), v)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_quat_from_euler_identity():
    q = m3.quat_from_euler(jnp.zeros(3))
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-7)


def test_slerp_endpoints():
    qa = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.3)
    qb = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 1.4)
    np.testing.assert_allclose(m3.quat_slerp(qa, qb, 0.0), qa, atol=1e-6)
    np.testing.assert_allclose(m3.quat_slerp(qa, qb, 1.0), qb, atol=1e-6)
    mid = m3.quat_slerp(qa, qb, 0.5)
    expect = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.85)
    np.testing.assert_allclose(mid, expect, atol=1e-5)


def test_compose_trs_transforms_point():
    pos = jnp.array([1.0, 2.0, 3.0])
    rot = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    scale = jnp.array([2.0, 2.0, 2.0])
    m = m3.compose_trs(pos, rot, scale)
    p = jnp.array([1.0, 0.0, 0.0])
    # scale -> rotate (x->y) -> translate
    np.testing.assert_allclose(m3.apply_mat4(m, p), [1.0, 4.0, 3.0], atol=1e-5)


def test_look_at_maps_target_to_minus_z():
    eye = jnp.array([0.0, 0.0, 5.0])
    target = jnp.zeros(3)
    up = jnp.array([0.0, 1.0, 0.0])
    v = m3.look_at(eye, target, up)
    p = m3.apply_mat4(v, target)
    np.testing.assert_allclose(p, [0.0, 0.0, -5.0], atol=1e-5)


def test_perspective_reverse_z_depth():
    proj = m3.perspective_reverse_z(jnp.pi / 2, 1.0, 0.1)
    near_pt = m3.apply_mat4_h(proj, jnp.array([0.0, 0.0, -0.1]))
    far_pt = m3.apply_mat4_h(proj, jnp.array([0.0, 0.0, -1000.0]))
    assert near_pt[2] / near_pt[3] == pytest.approx(1.0, abs=1e-5)
    assert far_pt[2] / far_pt[3] == pytest.approx(0.0, abs=1e-3)


def test_frustum_culling():
    view = m3.look_at(jnp.array([0.0, 0.0, 5.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(jnp.pi / 2, 1.0, 0.1)
    planes = m3.frustum_planes(proj @ view)
    mins = jnp.array([[-1.0, -1.0, -1.0], [100.0, -1.0, -1.0], [-1.0, -1.0, 8.0]])
    maxs = jnp.array([[1.0, 1.0, 1.0], [102.0, 1.0, 1.0], [1.0, 1.0, 10.0]])
    outside = m3.aabb_outside_frustum(planes, mins, maxs)
    # box at origin visible; box at x=100 out; box behind camera out
    np.testing.assert_array_equal(outside, [False, True, True])


def test_aabb_transform_contains_rotated_box():
    amin = jnp.array([-1.0, -2.0, -3.0])
    amax = jnp.array([1.0, 2.0, 3.0])
    rot = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.7)
    pos = jnp.array([5.0, 0.0, 0.0])
    nmin, nmax = m3.aabb_transform(amin, amax, pos, rot)
    # every transformed corner must lie inside
    corners = jnp.stack(jnp.meshgrid(
        jnp.array([-1.0, 1.0]), jnp.array([-2.0, 2.0]), jnp.array([-3.0, 3.0]),
        indexing="ij"), -1).reshape(-1, 3)
    tc = m3.quat_rotate(rot[None], corners) + pos
    assert bool(jnp.all(tc >= nmin - 1e-5)) and bool(jnp.all(tc <= nmax + 1e-5))


def test_quat_integrate_constant_spin():
    q = m3.quat_identity()
    omega = jnp.array([0.0, 1.0, 0.0])  # 1 rad/s about y
    dt = 1e-3
    for _ in range(100):
        q = m3.quat_integrate(q, omega, dt)
    expect = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.1)
    np.testing.assert_allclose(q, expect, atol=1e-4)


def test_srgb_roundtrip():
    c = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(m3.srgb_to_linear(m3.linear_to_srgb(c)), c, atol=1e-5)
