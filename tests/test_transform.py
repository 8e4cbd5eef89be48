import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.ecs import World
from garden_tpu.systems.camera import CameraSystem, view_matrix
from garden_tpu.systems.transform import (
    TransformSystem,
    bake_world_active,
    bake_world_matrices,
)


def make_world():
    w = World(capacity=16)
    w.create_system(TransformSystem())
    w.create_system(CameraSystem())
    return w


def test_hierarchy_chain_positions():
    w = make_world()
    a = w.create_entity()
    b = w.create_entity()
    c = w.create_entity()
    w.add_component(a, "transform", position=[1.0, 0.0, 0.0])
    w.add_component(b, "transform", position=[0.0, 2.0, 0.0], parent=a)
    w.add_component(c, "transform", position=[0.0, 0.0, 3.0], parent=b)
    mats = bake_world_matrices(w.device_state()["components"]["transform"])
    np.testing.assert_allclose(mats[c][:3, 3], [1.0, 2.0, 3.0], atol=1e-5)


def test_hierarchy_rotation_scale_compose():
    w = make_world()
    a = w.create_entity()
    b = w.create_entity()
    rot = m3.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    w.add_component(a, "transform", position=[0, 0, 0], rotation=np.asarray(rot),
                    scale=[2.0, 2.0, 2.0])
    w.add_component(b, "transform", position=[1.0, 0.0, 0.0], parent=a)
    mats = bake_world_matrices(w.device_state()["components"]["transform"])
    # child local +x scaled by 2 then rotated 90deg about z -> +y*2
    np.testing.assert_allclose(mats[b][:3, 3], [0.0, 2.0, 0.0], atol=1e-5)


def test_deep_chain_resolves():
    w = World(capacity=64)
    w.create_system(TransformSystem())
    prev = -1
    ids = []
    for i in range(20):
        e = w.create_entity()
        w.add_component(e, "transform", position=[1.0, 0.0, 0.0], parent=prev)
        prev = e
        ids.append(e)
    mats = bake_world_matrices(w.device_state()["components"]["transform"])
    np.testing.assert_allclose(mats[ids[-1]][:3, 3], [20.0, 0.0, 0.0], atol=1e-4)


def test_active_cascade():
    w = make_world()
    a = w.create_entity()
    b = w.create_entity()
    c = w.create_entity()
    w.add_component(a, "transform", active=False)
    w.add_component(b, "transform", parent=a)
    w.add_component(c, "transform", parent=b)
    active = bake_world_active(w.device_state()["components"]["transform"])
    assert not active[a] and not active[b] and not active[c]


def test_view_matrix_inverse_of_pose():
    pos = jnp.array([3.0, 1.0, -2.0])
    rot = m3.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.8)
    v = view_matrix(pos, rot)
    model = m3.compose_trs(pos, rot, jnp.ones(3))
    np.testing.assert_allclose(v @ model, np.eye(4), atol=1e-5)
