import jax
import jax.numpy as jnp
import numpy as np

from garden_tpu.core.config import EngineConfig, PhysicsConfig
from garden_tpu.engine import Engine
from garden_tpu.physics import queries
from garden_tpu.physics import world as pw
from garden_tpu.systems.animation import AnimationSystem
from garden_tpu.systems.character import CharacterSystem
from garden_tpu.systems.physics import PhysicsSystem
from garden_tpu.systems.spawner import MODE_ONE_SHOT, SpawnerSystem
from garden_tpu.systems.transform import TransformSystem


def make_engine(capacity=32):
    cfg = EngineConfig(capacity=capacity,
                       physics=PhysicsConfig(max_bodies=capacity, grid_dim=8))
    eng = Engine(cfg)
    eng.create_system(TransformSystem())
    anim = eng.create_system(AnimationSystem(max_tracks=8, max_keyframes=8))
    eng.create_system(SpawnerSystem())
    phys = eng.create_system(PhysicsSystem(cfg.physics))
    char = eng.create_system(CharacterSystem())
    eng.register_state("animation_tracks", anim.device_state)
    eng.initialize()
    return eng


def test_animation_track_interpolates():
    eng = make_engine()
    anim = eng.world.systems["AnimationSystem"]
    e = eng.world.create_entity()
    eng.world.add_component(e, "transform")
    track = anim.add_track([
        {"time": 0.0, "position": [0, 0, 0]},
        {"time": 1.0, "position": [10, 0, 0]},
        {"time": 2.0, "position": [10, 5, 0]},
    ])
    eng.world.add_component(e, "animation", track=track, looped=False)

    state = eng.device_state()
    state = eng.run_ticks(state, 30, 1.0 / 60.0)  # t = 0.5
    p = np.asarray(state["components"]["transform"]["position"][e])
    np.testing.assert_allclose(p, [5.0, 0, 0], atol=0.3)
    state = eng.run_ticks(state, 60, 1.0 / 60.0)  # t = 1.5
    p = np.asarray(state["components"]["transform"]["position"][e])
    np.testing.assert_allclose(p, [10.0, 2.5, 0], atol=0.3)
    # clamps at end (not looped)
    state = eng.run_ticks(state, 120, 1.0 / 60.0)
    p = np.asarray(state["components"]["transform"]["position"][e])
    np.testing.assert_allclose(p, [10.0, 5.0, 0], atol=0.1)


def test_animation_loops():
    eng = make_engine()
    anim = eng.world.systems["AnimationSystem"]
    e = eng.world.create_entity()
    eng.world.add_component(e, "transform")
    track = anim.add_track([
        {"time": 0.0, "position": [0, 0, 0]},
        {"time": 1.0, "position": [4, 0, 0]},
    ])
    eng.world.add_component(e, "animation", track=track, looped=True)
    state = eng.device_state()
    state = eng.run_ticks(state, 90, 1.0 / 60.0)  # t = 1.5 -> wraps to 0.5
    p = np.asarray(state["components"]["transform"]["position"][e])
    np.testing.assert_allclose(p, [2.0, 0, 0], atol=0.3)


def test_spawner_one_shot_with_delay():
    eng = make_engine()
    spawner = eng.world.systems["SpawnerSystem"]
    counter = []

    def prefab(world, owner):
        e = world.create_entity()
        world.add_component(e, "transform")
        counter.append(e)
        return e

    spawner.register_prefab("box", prefab)
    s = eng.world.create_entity()
    eng.world.add_component(s, "transform")
    spawner.add_spawner(s, "box", mode=MODE_ONE_SHOT, delay=0.5, max_count=2)

    assert spawner.process(0.1) == []       # 0.1s: still waiting
    created = spawner.process(0.5)          # 0.6s: spawn #1
    assert len(created) == 1
    created = spawner.process(0.1)          # spawn #2 (max_count=2)
    assert len(created) == 1
    assert spawner.process(0.1) == []       # capped
    assert len(spawner.spawned_of(s)) == 2


def test_character_walks_and_jumps():
    eng = make_engine()
    phys = eng.world.systems["PhysicsSystem"]
    char = eng.world.systems["CharacterSystem"]

    ground = eng.world.create_entity()
    eng.world.add_component(ground, "transform")
    phys.add_rigidbody(ground, phys.physics.shapes.plane((0, 1, 0), 0.0), motion=0)

    hero = eng.world.create_entity()
    eng.world.add_component(hero, "transform", position=[0.0, 1.0, 0.0])
    char.add_character(hero)

    state = eng.device_state()
    # settle onto the ground
    state = eng.run_ticks(state, 60, 1.0 / 60.0)
    assert bool(state["components"]["character"]["grounded"][hero])

    # walk +x
    comp = state["components"]["character"]
    comp = dict(comp, desired_vel=comp["desired_vel"].at[hero].set(
        jnp.array([2.0, 0.0, 0.0])))
    state = dict(state, components=dict(state["components"], character=comp))
    x0 = float(state["components"]["transform"]["position"][hero][0])
    state = eng.run_ticks(state, 60, 1.0 / 60.0)
    x1 = float(state["components"]["transform"]["position"][hero][0])
    assert x1 - x0 > 1.0, (x0, x1)
    # upright (angular lock)
    q = np.asarray(state["physics"]["bodies"]["quat"][
        int(state["components"]["character"]["body"][hero])])
    np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-3)

    # jump
    comp = state["components"]["character"]
    comp = dict(comp, jump_impulse=comp["jump_impulse"].at[hero].set(5.0))
    state = dict(state, components=dict(state["components"], character=comp))
    state = eng.run_ticks(state, 15, 1.0 / 60.0)
    body = int(state["components"]["character"]["body"][hero])
    vy = float(state["physics"]["bodies"]["linvel"][body][1])
    y = float(state["physics"]["bodies"]["pos"][body][1])
    assert y > 1.0 or vy > 0.5, (y, vy)


def test_raycast():
    from garden_tpu.core.config import PhysicsConfig
    cfg = PhysicsConfig(max_bodies=16, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.sphere(1.0), position=(0, 0, -5), motion=pw.STATIC)
    w.add_body(w.shapes.box((2, 2, 2)), position=(0, 0, -12), motion=pw.STATIC)
    state = w.device_state()

    hit = queries.cast_ray(state, jnp.array([0.0, 0.0, 0.0]),
                           jnp.array([0.0, 0.0, -1.0]))
    assert bool(hit.hit) and int(hit.body) == 0
    np.testing.assert_allclose(float(hit.distance), 4.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.point), [0, 0, -4], atol=1e-3)

    # miss
    miss = queries.cast_ray(state, jnp.array([0.0, 10.0, 0.0]),
                            jnp.array([0.0, 1.0, 0.0]))
    assert not bool(miss.hit) and int(miss.body) == -1

    # box hit behind the sphere: aim off-axis
    hit2 = queries.cast_ray(state, jnp.array([0.0, 1.8, 0.0]),
                            jnp.array([0.0, 0.0, -1.0]))
    assert bool(hit2.hit) and int(hit2.body) == 1


def test_character_climbs_step():
    """Walk-stairs: the character climbs a 0.3 m step while walking
    (CharacterVirtual ExtendedUpdate, character.cpp:265-272)."""
    eng = make_engine()
    phys = eng.world.systems["PhysicsSystem"]
    char = eng.world.systems["CharacterSystem"]

    ground = eng.world.create_entity()
    eng.world.add_component(ground, "transform")
    phys.add_rigidbody(ground, phys.physics.shapes.plane((0, 1, 0), 0.0),
                       motion=0)
    # a 0.3m-high step (platform) ahead of the character
    step_e = eng.world.create_entity()
    eng.world.add_component(step_e, "transform", position=[2.0, 0.15, 0.0])
    phys.add_rigidbody(step_e, phys.physics.shapes.box((1.0, 0.15, 2.0)),
                       motion=0, position=(2.0, 0.15, 0.0))

    hero = eng.world.create_entity()
    eng.world.add_component(hero, "transform", position=[0.0, 1.0, 0.0])
    char.add_character(hero, step_height=0.45)

    state = eng.device_state()
    state = eng.run_ticks(state, 60, 1.0 / 60.0)  # settle
    comp = state["components"]["character"]
    comp = dict(comp, desired_vel=comp["desired_vel"].at[hero].set(
        jnp.array([2.0, 0.0, 0.0])))
    state = dict(state, components=dict(state["components"], character=comp))
    state = eng.run_ticks(state, 75, 1.0 / 60.0)  # mid-platform at 2 m/s
    body = int(state["components"]["character"]["body"][hero])
    pos = np.asarray(state["physics"]["bodies"]["pos"][body])
    assert np.isfinite(pos).all()
    # made it onto the platform: x over the step, feet at step height
    assert pos[0] > 1.2, pos
    assert pos[1] > 0.3 + 0.85, pos  # capsule center above step surface


def test_animation_arbitrary_component_properties():
    """animate.hpp AnimationFrame parity: a track keyframes ANY registered
    component field — here a custom 'lamp' component's scalar intensity
    (lerp), its color vector (lerp), and an int mode flag (step)."""
    from garden_tpu.core.ecs import ComponentDef, Field

    eng = make_engine()
    world = eng.world
    anim = world.systems["AnimationSystem"]
    world.register_component(ComponentDef("lamp", {
        "intensity": Field((), jnp.float32, 1.0),
        "color": Field((3,), jnp.float32, (1.0, 1.0, 1.0)),
        "mode": Field((), jnp.int32, 0),
    }))
    e = world.create_entity()
    world.add_component(e, "transform")
    world.add_component(e, "lamp")
    track = anim.add_track([{"time": 0.0, "position": [0, 0, 0]},
                            {"time": 2.0, "position": [0, 0, 0]}])
    anim.add_property_keyframes(track, "lamp", "intensity", [
        {"time": 0.0, "value": 0.0}, {"time": 2.0, "value": 8.0}])
    anim.add_property_keyframes(track, "lamp", "color", [
        {"time": 0.0, "value": [1.0, 0.0, 0.0]},
        {"time": 2.0, "value": [0.0, 0.0, 1.0]}])
    anim.add_property_keyframes(track, "lamp", "mode", [
        {"time": 0.0, "value": 0}, {"time": 1.0, "value": 3}], mode="step")
    world.add_component(e, "animation", track=track, looped=False)
    # a second lamp WITHOUT the animation: must stay untouched
    e2 = world.create_entity()
    world.add_component(e2, "transform")
    world.add_component(e2, "lamp")

    state = eng.device_state()
    state = eng.run_ticks(state, 60, 1.0 / 60.0)  # t = 1.0
    lamp = state["components"]["lamp"]
    assert abs(float(lamp["intensity"][e]) - 4.0) < 0.3
    np.testing.assert_allclose(np.asarray(lamp["color"][e]),
                               [0.5, 0.0, 0.5], atol=0.05)
    # step mode: probe safely past the t=1 key (float dt accumulation
    # lands the 60th tick a ulp short of 1.0)
    state = eng.run_ticks(state, 6, 1.0 / 60.0)   # t = 1.1
    lamp = state["components"]["lamp"]
    assert int(lamp["mode"][e]) == 3
    assert float(lamp["intensity"][e2]) == 1.0
    np.testing.assert_allclose(np.asarray(lamp["color"][e2]), 1.0)
