import numpy as np

from garden_tpu.core.config import PhysicsConfig
from garden_tpu.net.replication import apply_snapshots, gather_snapshots
from garden_tpu.physics import world as pw


def test_replication_roundtrip():
    cfg = PhysicsConfig(max_bodies=16, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    b1 = w.add_body(w.shapes.sphere(0.5), position=(1, 5, 0), linvel=(2, 0, 0))
    b2 = w.add_body(w.shapes.sphere(0.5), position=(100, 5, 0))
    server = w.device_state()

    uid = np.full(16, -1, np.int64)
    uid[b1] = 42
    uid[b2] = 43
    # view radius excludes the far body
    payload = gather_snapshots(server, uid, view_center=(0, 5, 0), view_radius=10)

    # client world with the same bodies at stale positions
    w2 = pw.PhysicsWorld(cfg)
    w2.add_body(w2.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    c1 = w2.add_body(w2.shapes.sphere(0.5), position=(0, 0, 0))
    c2 = w2.add_body(w2.shapes.sphere(0.5), position=(0, 0, 0))
    client = w2.device_state()
    client = apply_snapshots(client, payload, {42: c1, 43: c2})

    np.testing.assert_allclose(np.asarray(client["bodies"]["pos"][c1]),
                               [1, 5, 0])
    np.testing.assert_allclose(np.asarray(client["bodies"]["linvel"][c1]),
                               [2, 0, 0])
    # far body was outside the view radius: untouched
    np.testing.assert_allclose(np.asarray(client["bodies"]["pos"][c2]),
                               [0, 0, 0])


def test_character_replication_roundtrip():
    """Character state 'c' message round-trip (character.hpp messageType):
    position/velocity land on the paired body; grounded rides along."""
    from garden_tpu.net.replication import apply_character, gather_character

    cfg = PhysicsConfig(max_bodies=8, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=0)
    body = w.add_body(w.shapes.capsule(0.3, 0.6), position=(1.0, 2.0, 3.0),
                      linvel=(0.5, 0.0, -0.25))
    state = w.device_state()
    chars = {
        "has": np.array([False, True] + [False] * 6),
        "body": np.array([-1, body] + [-1] * 6, np.int32),
        "grounded": np.array([False, True] + [False] * 6),
    }
    payload = gather_character(state, chars, {1: 4242})
    assert len(payload) > 0

    # receiving world: same entity layout, body at origin
    w2 = pw.PhysicsWorld(cfg)
    w2.add_body(w2.shapes.plane((0, 1, 0), 0.0), motion=0)
    b2 = w2.add_body(w2.shapes.capsule(0.3, 0.6))
    s2 = w2.device_state()
    s2 = apply_character(s2, chars, payload, {4242: 1})
    np.testing.assert_allclose(np.asarray(s2["bodies"]["pos"][b2]),
                               [1.0, 2.0, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2["bodies"]["linvel"][b2]),
                               [0.5, 0.0, -0.25], atol=1e-6)
