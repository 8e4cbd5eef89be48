"""Camera component and per-frame common constants.

Rebuild of CameraSystem (reference: include/garden/system/camera.hpp:102,186)
and the CommonConstants UBO GraphicsSystem prepares each frame (reference:
include/garden/graphics/constants.hpp:26-56, prepared at
source/system/graphics.cpp:192-269): view/proj/viewProj and inverses,
previous-frame viewProj for velocity, camera position, light direction, frame
size and time. Projection is reverse-Z (camera.hpp calcProjection).

CommonConstants is a plain dict pytree so it threads through jitted passes.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.ecs import ComponentDef, Field, System

Array = jnp.ndarray

PROJ_PERSPECTIVE = 0
PROJ_ORTHOGRAPHIC = 1

CAMERA = ComponentDef(
    "camera",
    {
        # perspective params (camera.hpp PerspectiveProjection)
        "fov_y": Field((), jnp.float32, 0.9),
        "aspect": Field((), jnp.float32, 16.0 / 9.0),
        "near": Field((), jnp.float32, 0.1),
        # orthographic params (camera.hpp OrthographicProjection)
        "ortho_extents": Field((6,), jnp.float32, (-1, 1, -1, 1, -1, 1)),
        "proj_type": Field((), jnp.int32, PROJ_PERSPECTIVE),
    },
)


def view_matrix(position: Array, rotation: Array) -> Array:
    """World-space camera pose -> view matrix (inverse rigid transform)."""
    r = m3.quat_to_mat3(rotation)
    rt = jnp.swapaxes(r, -1, -2)
    t = -m3.einsum("...ij,...j->...i", rt, position)
    top = jnp.concatenate([rt, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def common_constants(
    camera_position: Array,
    view: Array,
    projection: Array,
    light_dir: Array,
    frame_size: tuple,
    time: Array,
    delta_time: Array,
    prev_view_proj: Optional[Array] = None,
) -> Dict[str, Array]:
    """Build the CommonConstants pytree (constants.hpp:26-56 analog)."""
    view_proj = m3.matmul(projection, view)
    inv_view = m3.mat4_inverse(view)
    inv_proj = m3.mat4_inverse(projection)
    return {
        "view": view,
        "projection": projection,
        "view_proj": view_proj,
        "inv_view": inv_view,
        "inv_proj": inv_proj,
        "inv_view_proj": m3.matmul(inv_view, inv_proj),
        "prev_view_proj": view_proj if prev_view_proj is None else prev_view_proj,
        "camera_pos": camera_position,
        "light_dir": m3.normalize(light_dir),
        "frame_size": jnp.array(frame_size, dtype=jnp.float32),
        "inv_frame_size": 1.0 / jnp.array(frame_size, dtype=jnp.float32),
        "time": jnp.asarray(time, jnp.float32),
        "delta_time": jnp.asarray(delta_time, jnp.float32),
    }


class CameraSystem(System):
    component = CAMERA
