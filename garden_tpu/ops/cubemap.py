"""Equirectangular -> cubemap conversion.

Rebuild of Equi2Cube (include/garden/graphics/equi2cube.hpp:31-41,
source/graphics/equi2cube.cpp + the CLI): converts an equirect panorama to
six cube faces. Vectorized bilinear sampling — used for skybox/IBL assets.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray

# face directions: +x, -x, +y, -y, +z, -z (the Vulkan cubemap order the
# reference uses)
_FACE_AXES = [
    ((0, 0, -1), (0, -1, 0), (1, 0, 0)),    # +x: right=-z, up=-y
    ((0, 0, 1), (0, -1, 0), (-1, 0, 0)),    # -x
    ((1, 0, 0), (0, 0, 1), (0, 1, 0)),      # +y
    ((1, 0, 0), (0, 0, -1), (0, -1, 0)),    # -y
    ((1, 0, 0), (0, -1, 0), (0, 0, 1)),     # +z
    ((-1, 0, 0), (0, -1, 0), (0, 0, -1)),   # -z
]


def equi_to_cube(equi: Array, face_size: int) -> Array:
    """(H, W, C) equirect -> (6, face_size, face_size, C) cubemap."""
    h, w = equi.shape[:2]
    uv = (jnp.arange(face_size, dtype=jnp.float32) + 0.5) / face_size * 2.0 - 1.0
    v_grid, u_grid = jnp.meshgrid(uv, uv, indexing="ij")

    faces = []
    for right, up, forward in _FACE_AXES:
        r = jnp.asarray(right, jnp.float32)
        u = jnp.asarray(up, jnp.float32)
        f = jnp.asarray(forward, jnp.float32)
        d = (f[None, None] + u_grid[..., None] * r[None, None]
             + v_grid[..., None] * u[None, None])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        lon = jnp.arctan2(d[..., 0], d[..., 2])
        lat = jnp.arcsin(jnp.clip(d[..., 1], -1.0, 1.0))
        x = (lon / (2.0 * math.pi) + 0.5) * w - 0.5
        y = (0.5 - lat / math.pi) * h - 0.5

        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0w = jnp.mod(x0, w)
        x1w = jnp.mod(x0 + 1, w)
        y0c = jnp.clip(y0, 0, h - 1)
        y1c = jnp.clip(y0 + 1, 0, h - 1)
        c00 = equi[y0c, x0w]
        c10 = equi[y0c, x1w]
        c01 = equi[y1c, x0w]
        c11 = equi[y1c, x1w]
        face = ((c00 * (1 - fx) + c10 * fx) * (1 - fy)
                + (c01 * (1 - fx) + c11 * fx) * fy)
        faces.append(face)
    return jnp.stack(faces)


def sample_cubemap(cube: Array, directions: Array) -> Array:
    """Nearest-face bilinear-free cubemap sample (..., 3) -> (..., C)."""
    d = directions
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    size = cube.shape[1]

    face = jnp.where(
        (ax >= ay) & (ax >= az),
        jnp.where(d[..., 0] > 0, 0, 1),
        jnp.where(ay >= az,
                  jnp.where(d[..., 1] > 0, 2, 3),
                  jnp.where(d[..., 2] > 0, 4, 5)),
    )

    def face_uv(i: int) -> Tuple[Array, Array]:
        right, up, forward = _FACE_AXES[i]
        r = jnp.asarray(right, jnp.float32)
        u = jnp.asarray(up, jnp.float32)
        f = jnp.asarray(forward, jnp.float32)
        t = jnp.sum(d * f, axis=-1)
        t = jnp.where(jnp.abs(t) < 1e-6, 1e-6, t)
        uu = jnp.sum(d * r, axis=-1) / t
        vv = jnp.sum(d * u, axis=-1) / t
        return uu, vv

    uu = jnp.zeros(d.shape[:-1])
    vv = jnp.zeros(d.shape[:-1])
    for i in range(6):
        fu, fv = face_uv(i)
        uu = jnp.where(face == i, fu, uu)
        vv = jnp.where(face == i, fv, vv)
    px = jnp.clip(((uu * 0.5 + 0.5) * size).astype(jnp.int32), 0, size - 1)
    py = jnp.clip(((vv * 0.5 + 0.5) * size).astype(jnp.int32), 0, size - 1)
    return cube[face, py, px]
