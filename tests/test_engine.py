import jax
import jax.numpy as jnp
import numpy as np

from garden_tpu.core.config import EngineConfig, PhysicsConfig
from garden_tpu.engine import Engine
from garden_tpu.systems.camera import CameraSystem
from garden_tpu.systems.physics import PhysicsSystem
from garden_tpu.systems.transform import TransformSystem


def test_engine_physics_transform_roundtrip():
    cfg = EngineConfig(
        capacity=32,
        physics=PhysicsConfig(max_bodies=32, grid_dim=8, cell_size=2.0),
    )
    eng = Engine(cfg)
    eng.create_system(TransformSystem())
    eng.create_system(CameraSystem())
    phys = eng.create_system(PhysicsSystem(cfg.physics))
    eng.initialize()

    ground = eng.world.create_entity()
    eng.world.add_component(ground, "transform")
    phys.add_rigidbody(ground, phys.physics.shapes.plane((0, 1, 0), 0.0),
                       motion=0)

    ball = eng.world.create_entity()
    eng.world.add_component(ball, "transform", position=[0.0, 5.0, 0.0])
    phys.add_rigidbody(ball, phys.physics.shapes.sphere(0.5))

    state = eng.device_state()
    state = eng.run_ticks(state, 180, 1.0 / 60.0)

    eng.world.adopt(state)
    # transform follows the body: ball fell and rests on the plane
    y = float(state["components"]["transform"]["position"][ball][1])
    assert 0.4 < y < 0.7, y
    assert int(state["tick"]) == 180
    # ground transform untouched (static)
    gy = float(state["components"]["transform"]["position"][ground][1])
    assert gy == 0.0


def test_combined_step_deterministic():
    """Bitwise determinism of the full combined step (physics + frame):
    two runs from the same initial state produce identical states and
    images after several steps (jit purity makes data races structurally
    impossible — SURVEY.md section 5.2; this pins it)."""
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    step, state0 = ge._build(n_bodies=24, width=128, height=128, grid_dim=8,
                             tile_size=128)
    jstep = jax.jit(step)

    def run(n):
        s = jax.tree_util.tree_map(lambda x: x, state0)
        img = None
        for _ in range(n):
            s, img = jstep(s)
        return s, img

    s1, img1 = run(4)
    s2, img2 = run(4)
    for a, b in zip(jax.tree_util.tree_leaves(s1),
                    jax.tree_util.tree_leaves(s2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
