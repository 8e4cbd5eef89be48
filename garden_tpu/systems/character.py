"""Character controller.

Rebuild of CharacterSystem/CharacterComponent (include/garden/system/
character.hpp:50, source/system/character.cpp:265-272: a
JPH::CharacterVirtual with ExtendedUpdate — stick-to-floor + walk-stairs).
TPU formulation: the character is a capsule rigidbody with locked rotation
(angular_factor = 0, the AllowedDOF trick) driven by velocity control; the
ground state comes from the body's contact normals each step (grounded =
any supporting contact whose normal is within max_slope of up), which is
how CharacterVirtual classifies its ground, minus the stair sub-stepping.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.ecs import ComponentDef, Field, System
from garden_tpu.physics import world as pw

Array = jnp.ndarray

CHARACTER = ComponentDef(
    "character",
    {
        "body": Field((), jnp.int32, -1),
        "desired_vel": Field((3,), jnp.float32, 0.0),
        "jump_impulse": Field((), jnp.float32, 0.0),
        "grounded": Field((), jnp.bool_, False),
        "max_slope_cos": Field((), jnp.float32, 0.7071),  # 45 degrees
        "control_accel": Field((), jnp.float32, 30.0),
    },
)


class CharacterSystem(System):
    component = CHARACTER

    def attach(self, world) -> None:
        super().attach(world)
        # runs just before PhysicsSystem (priority 10) applies simulate
        world.events.subscribe("Update", self.update, priority=9.0)

    def add_character(self, entity: int, radius: float = 0.3,
                      half_height: float = 0.6, mass: float = 70.0) -> int:
        phys = self.world.systems["PhysicsSystem"]
        shape = phys.physics.shapes.capsule(radius, half_height)
        body = phys.add_rigidbody(
            entity, shape, friction=0.2, mass_override=mass,
            angular_factor=(0.0, 0.0, 0.0),  # upright lock
        )
        self.world.add_component(entity, "character", body=body)
        return body

    def update(self, state: Dict[str, Any], ctx: Dict[str, Any]) -> Dict[str, Any]:
        comp = state["components"].get("character")
        if comp is None:
            return state
        phys = state["physics"]
        bodies = phys["bodies"]
        dt = ctx["delta_time"]

        body = jnp.maximum(comp["body"], 0)
        active = comp["has"] & (comp["body"] >= 0)

        # ground state computed by the physics step from contact normals
        # (CharacterVirtual ground classification analog, world.step)
        grounded = phys["grounded"][body] & active

        # velocity control: steer horizontal velocity toward desired
        linvel = bodies["linvel"]
        v = linvel[body]
        desired = comp["desired_vel"]
        accel = comp["control_accel"] * dt
        dvx = jnp.clip(desired[:, 0] - v[:, 0], -accel, accel)
        dvz = jnp.clip(desired[:, 2] - v[:, 2], -accel, accel)
        jump = jnp.where(grounded & (comp["jump_impulse"] > 0.0),
                         comp["jump_impulse"], 0.0)
        new_v = v + jnp.stack([dvx, jump, dvz], axis=-1) * jnp.where(
            active[:, None], 1.0, 0.0)

        capacity = linvel.shape[0]
        target = jnp.where(active, body, capacity)
        linvel = linvel.at[target].set(new_v, mode="drop")

        # sync the per-character slope limit into the body's ground
        # threshold so serialized max_slope_cos values take effect
        ground_cos = bodies["ground_cos"].at[target].set(
            comp["max_slope_cos"], mode="drop")

        bodies = dict(bodies, linvel=linvel, ground_cos=ground_cos)
        comp = dict(comp, grounded=grounded,
                    jump_impulse=jnp.where(grounded, 0.0, comp["jump_impulse"]))
        return dict(
            state,
            physics=dict(phys, bodies=bodies),
            components=dict(state["components"], character=comp),
        )
