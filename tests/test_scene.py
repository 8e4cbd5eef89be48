import json

import numpy as np

from garden_tpu.core.config import EngineConfig, PhysicsConfig
from garden_tpu.engine import Engine
from garden_tpu.ops import noise
from garden_tpu.scene.scene import SceneSerializer
from garden_tpu.systems.camera import CameraSystem
from garden_tpu.systems.link import LinkSystem
from garden_tpu.systems.physics import PhysicsSystem
from garden_tpu.systems.transform import TransformSystem

import jax.numpy as jnp


def make_engine():
    cfg = EngineConfig(capacity=32,
                       physics=PhysicsConfig(max_bodies=32, grid_dim=8))
    eng = Engine(cfg)
    eng.create_system(TransformSystem())
    eng.create_system(CameraSystem())
    eng.create_system(LinkSystem())
    eng.create_system(PhysicsSystem(cfg.physics))
    eng.initialize()
    return eng


def test_scene_roundtrip(tmp_path):
    eng = make_engine()
    w = eng.world
    phys = w.systems["PhysicsSystem"]

    parent = w.create_entity()
    w.add_component(parent, "transform", position=[1, 2, 3])
    child = w.create_entity()
    w.add_component(child, "transform", position=[0, 1, 0], parent=parent,
                    scale=[2, 2, 2])
    cam = w.create_entity()
    w.add_component(cam, "transform", position=[0, 5, 10])
    w.add_component(cam, "camera", fov_y=1.2)
    ball = w.create_entity()
    w.add_component(ball, "transform", position=[0, 3, 0])
    phys.add_rigidbody(ball, phys.physics.shapes.sphere(0.5), restitution=0.4)

    ser = SceneSerializer(w)
    path = str(tmp_path / "test.scene")
    scene = ser.store_scene(path)
    assert len(scene["entities"]) == 4
    # format check: reference shape (resource.cpp:2637)
    comp0 = scene["entities"][0]["components"][0]
    assert ".type" in comp0

    # load into a fresh engine
    eng2 = make_engine()
    ser2 = SceneSerializer(eng2.world)
    created = ser2.load_scene(path)
    assert len(created) == 4

    # hierarchy reconnected via uid
    t = eng2.world._stores["transform"]
    child2 = [e for e in created
              if t["has"][e] and tuple(t["scale"][e]) == (2.0, 2.0, 2.0)][0]
    p2 = int(t["parent"][child2])
    assert p2 >= 0 and tuple(t["position"][p2]) == (1.0, 2.0, 3.0)

    # camera restored
    cams = eng2.world._stores["camera"]
    cam2 = [e for e in created if cams["has"][e]][0]
    assert abs(float(cams["fov_y"][cam2]) - 1.2) < 1e-6

    # rigidbody restored with restitution
    phys2 = eng2.world.systems["PhysicsSystem"]
    rb = eng2.world._stores["rigidbody"]
    ball2 = [e for e in created if rb["has"][e]][0]
    b2 = int(rb["body"][ball2])
    assert abs(float(phys2.physics._b["restitution"][b2]) - 0.4) < 1e-6

    # clear_scene leaves nothing
    ser2.clear_scene()
    assert eng2.world.entity_count() == 0


def test_clear_scene_respects_do_not_destroy():
    eng = make_engine()
    w = eng.world
    keep = w.create_entity()
    w.add_component(keep, "transform", do_not_destroy=True)
    gone = w.create_entity()
    w.add_component(gone, "transform")
    SceneSerializer(w).clear_scene()
    assert w.is_alive(keep) and not w.is_alive(gone)


def test_do_not_serialize():
    eng = make_engine()
    w = eng.world
    e = w.create_entity()
    w.add_component(e, "transform", do_not_serialize=True)
    scene = SceneSerializer(w).store_scene()
    assert scene["entities"] == []


def test_noise_kernels():
    xs = jnp.linspace(0.0, 10.0, 64)
    gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
    n = np.asarray(noise.perlin2(gx, gy))
    assert n.shape == (64, 64)
    assert -1.5 < n.min() and n.max() < 1.5
    assert n.std() > 0.1  # actually varies
    # determinism + seed variation
    n2 = np.asarray(noise.perlin2(gx, gy))
    np.testing.assert_array_equal(n, n2)
    n3 = np.asarray(noise.perlin2(gx, gy, seed=1))
    assert not np.allclose(n, n3)
    # 3D + fbm + terrain
    z = jnp.ones_like(gx)
    n3d = np.asarray(noise.perlin3(gx, gy, z))
    assert n3d.std() > 0.1
    f = np.asarray(noise.fbm(noise.perlin2, gx, gy, octaves=4))
    assert f.std() > 0.05
    hm = np.asarray(noise.terrain_heightmap(32))
    assert hm.shape == (32, 32) and np.isfinite(hm).all() and hm.std() > 0.5


def test_scene_roundtrip_gameplay_components(tmp_path):
    from garden_tpu.systems.animation import AnimationSystem
    from garden_tpu.systems.spawner import SpawnerSystem
    from garden_tpu.systems.ui import UiButtonSystem, UiCheckboxSystem, UiTransformSystem

    cfg = EngineConfig(capacity=16,
                       physics=PhysicsConfig(max_bodies=16, grid_dim=8))

    def mk():
        eng = Engine(cfg)
        eng.create_system(TransformSystem())
        eng.create_system(LinkSystem())
        eng.create_system(AnimationSystem(max_tracks=4, max_keyframes=4))
        eng.create_system(SpawnerSystem())
        eng.create_system(UiTransformSystem())
        eng.create_system(UiButtonSystem())
        eng.create_system(UiCheckboxSystem())
        eng.initialize()
        return eng

    eng = mk()
    w = eng.world
    anim_sys = w.systems["AnimationSystem"]
    # named track: the stable identity that survives serialization
    track = anim_sys.add_track(
        [{"time": 0.0, "position": [0, 0, 0]},
         {"time": 1.0, "position": [1, 0, 0]}], name="bounce")
    e = w.create_entity()
    w.add_component(e, "transform")
    w.add_component(e, "animation", track=track, speed=1.5, looped=False)
    w.add_component(e, "spawner", delay=0.7, max_count=5)
    u = w.create_entity()
    w.add_component(u, "transform")
    w.add_component(u, "ui_transform", position=[10, 20], size=[80, 30],
                    anchor=1)
    w.add_component(u, "ui_checkbox", checked=True)

    path = str(tmp_path / "gameplay.scene")
    SceneSerializer(w).store_scene(path)

    eng2 = mk()
    # fresh process analog: the track must be re-registered under the same
    # name BEFORE the scene loads (or be a loadable .anim path)
    anim2 = eng2.world.systems["AnimationSystem"]
    anim2.add_track([{"time": 0.0}], name="other")  # different index order
    track2 = anim2.add_track(
        [{"time": 0.0, "position": [0, 0, 0]},
         {"time": 1.0, "position": [1, 0, 0]}], name="bounce")
    created = SceneSerializer(eng2.world).load_scene(path)
    assert len(created) == 2
    s = eng2.world._stores
    anim_e = [x for x in created if s["animation"]["has"][x]][0]
    # resolved by name, not by the stored-process index
    assert int(s["animation"]["track"][anim_e]) == track2
    assert abs(float(s["animation"]["speed"][anim_e]) - 1.5) < 1e-6
    assert not s["animation"]["looped"][anim_e]
    assert abs(float(s["spawner"]["delay"][anim_e]) - 0.7) < 1e-6
    ui_e = [x for x in created if s["ui_transform"]["has"][x]][0]
    np.testing.assert_allclose(s["ui_transform"]["size"][ui_e], [80, 30])
    assert s["ui_checkbox"]["checked"][ui_e]


def test_scene_roundtrip_new_shapes_and_widgets(tmp_path):
    """Hull/heightfield/compound rigidbody shapes and label/input widgets
    survive a scene save/load in a fresh process (reference .scene format,
    resource.cpp:2357 loadScene)."""
    from garden_tpu.systems.physics import PhysicsSystem
    from garden_tpu.systems.ui import (
        UiInputSystem, UiLabelSystem, UiTransformSystem,
    )

    cfg = EngineConfig(capacity=16,
                       physics=PhysicsConfig(max_bodies=16, grid_dim=8))

    def mk():
        eng = Engine(cfg)
        eng.create_system(TransformSystem())
        eng.create_system(LinkSystem())
        eng.create_system(PhysicsSystem(cfg.physics))
        eng.create_system(UiTransformSystem())
        eng.create_system(UiLabelSystem())
        eng.create_system(UiInputSystem())
        eng.initialize()
        return eng

    eng = mk()
    w = eng.world
    phys = w.systems["PhysicsSystem"]
    shapes = phys.physics.shapes

    pts = np.array([[sx, sy, sz] for sx in (-0.5, 0.5) for sy in (-0.4, 0.4)
                    for sz in (-0.3, 0.3)], np.float32)
    hull = shapes.hull(pts)
    e1 = w.create_entity()
    w.add_component(e1, "transform", position=[0, 2, 0])
    phys.add_rigidbody(e1, hull, position=(0, 2, 0))

    grid = np.fromfunction(lambda z, x: 0.1 * x, (8, 8), dtype=np.float32)
    hf = shapes.heightfield(grid, cell=2.0)
    e2 = w.create_entity()
    w.add_component(e2, "transform")
    phys.add_rigidbody(e2, hf, motion=0)

    s0 = shapes.sphere(0.25)
    comp = shapes.compound([(s0, (-0.4, 0, 0), (0, 0, 0, 1)),
                            (s0, (0.4, 0, 0), (0, 0, 0, 1))])
    e3 = w.create_entity()
    w.add_component(e3, "transform", position=[3, 1, 0])
    phys.add_rigidbody(e3, comp, position=(3, 1, 0))

    lab = w.create_entity()
    w.add_component(lab, "transform")
    w.add_component(lab, "ui_transform", size=[120, 20])
    w.add_component(lab, "ui_label", scale=1.5)
    w.systems["UiLabelSystem"].set_text(lab, "Score: 42")
    inp = w.create_entity()
    w.add_component(inp, "transform")
    w.add_component(inp, "ui_transform", size=[150, 22])
    w.add_component(inp, "ui_input", max_length=32)
    w.systems["UiInputSystem"].set_text(inp, "player1")

    path = str(tmp_path / "shapes.scene")
    SceneSerializer(w).store_scene(path)

    eng2 = mk()
    created = SceneSerializer(eng2.world).load_scene(path)
    assert len(created) == 5
    phys2 = eng2.world.systems["PhysicsSystem"]
    shapes2 = phys2.physics.shapes
    from garden_tpu.physics import shapes as sh
    types = sorted(int(t) for t in shapes2.types[: shapes2.count()])
    assert sh.HULL in types and sh.HEIGHTFIELD in types \
        and sh.COMPOUND in types
    # heightfield data round-trips
    hfi = [i for i in range(shapes2.count())
           if shapes2.types[i] == sh.HEIGHTFIELD][0]
    f = int(shapes2.params[hfi, 0])
    np.testing.assert_allclose(shapes2.hf_heights[f, :8, :8], grid, atol=1e-6)
    # widget text round-trips
    s2 = eng2.world._stores
    lab2 = [x for x in created if s2["ui_label"]["has"][x]][0]
    assert eng2.world.systems["UiLabelSystem"].text(lab2) == "Score: 42"
    inp2 = [x for x in created if s2["ui_input"]["has"][x]][0]
    assert eng2.world.systems["UiInputSystem"].text(inp2) == "player1"
    assert int(s2["ui_input"]["max_length"][inp2]) == 32
