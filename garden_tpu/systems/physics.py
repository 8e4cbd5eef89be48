"""PhysicsSystem: the ECS bridge to the physics world.

Rebuild of the reference's PhysicsSystem + RigidbodyComponent glue
(include/garden/system/physics.hpp:362,667): rigidbodies are ECS components
referencing slots in the physics body arrays; each tick the system runs the
fixed-rate accumulator (`simulate`, physics.cpp:1154-1222) and writes body
poses back into transform components — the `prepareSimulate` /
`interpolateResult` thread-pool fan-outs (physics.cpp:998-1040, 1108-1144)
become one masked scatter.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import PhysicsConfig
from garden_tpu.core.ecs import ComponentDef, Field, System, World
from garden_tpu.physics import world as pw

Array = jnp.ndarray

RIGIDBODY = ComponentDef(
    "rigidbody",
    {
        "body": Field((), jnp.int32, -1),  # slot in the physics body arrays
    },
)


class PhysicsSystem(System):
    component = RIGIDBODY

    def __init__(self, config: Optional[PhysicsConfig] = None):
        self.config = config or PhysicsConfig()
        self.physics = pw.PhysicsWorld(self.config)

    def attach(self, world: World) -> None:
        super().attach(world)
        world.events.subscribe("Update", self.update, priority=10.0)

    # -- host-side body creation -------------------------------------------

    def add_rigidbody(self, entity: int, shape: int, **kwargs) -> int:
        """Create a body for an entity (setShape analog, physics.hpp:413)."""
        tstore = self.world._stores.get("transform")
        if tstore is not None and tstore["has"][entity]:
            kwargs.setdefault("position", tstore["position"][entity])
            kwargs.setdefault("rotation", tstore["rotation"][entity])
        body = self.physics.add_body(shape, entity=entity, **kwargs)
        self.world.add_component(entity, "rigidbody", body=body)
        return body

    def device_state(self) -> Dict[str, Any]:
        return self.physics.device_state()

    # -- per-tick update (pure, called inside the jitted step) --------------

    def update(self, state: Dict[str, Any], ctx: Dict[str, Any]) -> Dict[str, Any]:
        phys = state["physics"]
        phys = pw.simulate(phys, self.config, ctx["delta_time"],
                           present_types=self.physics.shapes.present_types())
        state = dict(state, physics=phys)
        if "transform" in state["components"]:
            state = self.sync_transforms(state)
        return state

    def sync_transforms(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Write interpolated body poses into transform components.

        Equivalent to prepareSimulate's ECS<-Jolt transform copy, skipping
        static bodies (physics.cpp:998-1040).
        """
        phys = state["physics"]
        pos, quat = pw.interpolated_pose(phys, self.config)
        bodies = phys["bodies"]
        tcomp = state["components"]["transform"]
        entities = bodies["entity"]
        movable = (
            bodies["has"]
            & (entities >= 0)
            & (bodies["motion"] != pw.STATIC)
        )
        # non-movable slots scatter to an out-of-bounds index and are dropped
        capacity = tcomp["position"].shape[0]
        target = jnp.where(movable, entities, capacity)
        new_pos = tcomp["position"].at[target].set(pos, mode="drop")
        new_rot = tcomp["rotation"].at[target].set(quat, mode="drop")
        tcomp = dict(tcomp, position=new_pos, rotation=new_rot)
        return dict(state, components=dict(state["components"], transform=tcomp))
