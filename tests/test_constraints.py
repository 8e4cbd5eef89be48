import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from garden_tpu.core.config import PhysicsConfig
from garden_tpu.physics import constraints as con
from garden_tpu.physics import world as pw


def test_point_constraint_pendulum():
    """A ball pinned to a static anchor swings, keeping the anchor distance."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8, solver_iterations=10)
    w = pw.PhysicsWorld(cfg)
    anchor = w.add_body(w.shapes.sphere(0.1), position=(0, 5, 0), motion=pw.STATIC)
    bob = w.add_body(w.shapes.sphere(0.2), position=(1.0, 5.0, 0.0))
    table = con.ConstraintTable(8)
    table.point(anchor, bob, (0, 5, 0),
                w._b["pos"][anchor], w._b["quat"][anchor],
                w._b["pos"][bob], w._b["quat"][bob])
    state = w.device_state()
    state["constraints"] = table.device_arrays()

    stepf = jax.jit(lambda s: pw.step(s, cfg, 1 / 60, w.shapes.present_types()))
    for _ in range(120):
        state = stepf(state)
    p = np.asarray(state["bodies"]["pos"][bob])
    # bob stays ~1m from the pivot while swinging
    dist = np.linalg.norm(p - np.array([0, 5, 0]))
    assert 0.8 < dist < 1.2, (p, dist)
    # it actually swung down
    assert p[1] < 5.0


def test_fixed_constraint_locks_pair():
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8, solver_iterations=10,
                        gravity=(0.0, 0.0, 0.0))
    w = pw.PhysicsWorld(cfg)
    a = w.add_body(w.shapes.box((0.5, 0.5, 0.5)), position=(0, 0, 0),
                   linvel=(1.0, 0, 0))
    b = w.add_body(w.shapes.box((0.5, 0.5, 0.5)), position=(1.2, 0, 0))
    table = con.ConstraintTable(8)
    table.add(con.FIXED, a, b, anchor_a=(0.6, 0, 0), anchor_b=(-0.6, 0, 0))
    state = w.device_state()
    state["constraints"] = table.device_arrays()

    stepf = jax.jit(lambda s: pw.step(s, cfg, 1 / 60, w.shapes.present_types()))
    for _ in range(60):
        state = stepf(state)
    va = np.asarray(state["bodies"]["linvel"][a])
    vb = np.asarray(state["bodies"]["linvel"][b])
    # velocities converge (they move as one assembly)
    np.testing.assert_allclose(va, vb, atol=0.05)
    # momentum conserved: total ~ m*1 split over both
    assert 0.3 < va[0] < 0.7
    # relative orientation stays locked
    qa = np.asarray(state["bodies"]["quat"][a])
    qb = np.asarray(state["bodies"]["quat"][b])
    assert abs(np.dot(qa, qb)) > 0.999
