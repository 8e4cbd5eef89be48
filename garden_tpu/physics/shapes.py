"""Collision shapes as a deduplicated SoA shape table.

Rebuild of the reference's Shape pool (include/garden/system/physics.hpp:232,
103-153: Box/Sphere/Capsule/... sub-types over JPH::Shape) and its
shared-shape dedup maps keyed by content hash (physics.hpp:719-725). Shapes
live in fixed-capacity arrays; bodies reference shapes by index; `ShapeTable`
dedupes on the host by parameter hash.

Shape params layout (f32[4]):
- SPHERE:  [radius, -, -, -]
- BOX:     [hx, hy, hz, convex_radius]
- CAPSULE: [radius, half_height, -, -]   (axis = local Y)
- PLANE:   [nx, ny, nz, d]  with n.x*x+n.y*y+n.z*z + d = 0, inside n side
"""

from __future__ import annotations

import hashlib
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

EMPTY = 0
SPHERE = 1
BOX = 2
CAPSULE = 3
PLANE = 4

SHAPE_NAMES = {EMPTY: "empty", SPHERE: "sphere", BOX: "box",
               CAPSULE: "capsule", PLANE: "plane"}


class ShapeTable:
    """Host-side shape registry with content-hash dedup.

    Mirrors PhysicsSystem's shared-shape maps (physics.hpp:719-725): creating
    the same sphere twice returns the same index.
    """

    def __init__(self, capacity: int = 1024) -> None:
        self.capacity = capacity
        self.types = np.zeros((capacity,), dtype=np.int32)
        self.params = np.zeros((capacity, 4), dtype=np.float32)
        self.density = np.ones((capacity,), dtype=np.float32)
        self._count = 0
        self._dedup: Dict[bytes, int] = {}

    def _intern(self, stype: int, params, density: float) -> int:
        params = np.asarray(params, dtype=np.float32)
        key = hashlib.blake2b(
            np.concatenate([[stype], params, [density]]).astype(np.float32).tobytes(),
            digest_size=16,
        ).digest()
        if key in self._dedup:
            return self._dedup[key]
        if self._count >= self.capacity:
            raise RuntimeError("shape capacity exhausted")
        idx = self._count
        self._count += 1
        self.types[idx] = stype
        self.params[idx] = params
        self.density[idx] = density
        self._dedup[key] = idx
        return idx

    def sphere(self, radius: float, density: float = 1000.0) -> int:
        return self._intern(SPHERE, [radius, 0, 0, 0], density)

    def box(self, half_extents, convex_radius: float = 0.05,
            density: float = 1000.0) -> int:
        hx, hy, hz = half_extents
        return self._intern(BOX, [hx, hy, hz, convex_radius], density)

    def capsule(self, radius: float, half_height: float,
                density: float = 1000.0) -> int:
        return self._intern(CAPSULE, [radius, half_height, 0, 0], density)

    def plane(self, normal=(0.0, 1.0, 0.0), d: float = 0.0) -> int:
        n = np.asarray(normal, np.float32)
        n = n / np.linalg.norm(n)
        return self._intern(PLANE, [n[0], n[1], n[2], d], 1000.0)

    def device_arrays(self) -> Dict[str, Array]:
        return {
            "type": jnp.asarray(self.types),
            "params": jnp.asarray(self.params),
            "density": jnp.asarray(self.density),
        }

    def count(self) -> int:
        return self._count

    def present_types(self) -> frozenset:
        """Static set of shape types in use (trace-time kernel pruning)."""
        return frozenset(int(t) for t in self.types[: self._count])


# ---------------------------------------------------------------------------
# Batched shape queries (device-side, indexed by per-body shape arrays)
# ---------------------------------------------------------------------------


def mass_properties(stype: Array, params: Array, density: Array
                    ) -> Tuple[Array, Array]:
    """(mass, local diagonal inertia) per shape — analog of Jolt's
    MassProperties used by Shape mass/volume queries (physics.hpp:259-276)."""
    r = params[..., 0]
    hx, hy, hz = params[..., 0], params[..., 1], params[..., 2]
    hh = params[..., 1]

    sphere_mass = density * (4.0 / 3.0) * jnp.pi * r ** 3
    sphere_i = 0.4 * sphere_mass * r ** 2
    sphere_inertia = jnp.stack([sphere_i, sphere_i, sphere_i], -1)

    box_mass = density * 8.0 * hx * hy * hz
    box_inertia = (box_mass[..., None] / 3.0) * jnp.stack(
        [hy ** 2 + hz ** 2, hx ** 2 + hz ** 2, hx ** 2 + hy ** 2], -1
    )

    # capsule: cylinder + two hemispheres about local Y
    cyl_m = density * jnp.pi * r ** 2 * (2.0 * hh)
    hem_m = density * (2.0 / 3.0) * jnp.pi * r ** 3
    cap_mass = cyl_m + 2.0 * hem_m
    cyl_iy = 0.5 * cyl_m * r ** 2
    cyl_ix = cyl_m * (3.0 * r ** 2 + (2.0 * hh) ** 2) / 12.0
    hem_iy = 0.4 * hem_m * r ** 2
    hem_ix = hem_iy + hem_m * (hh + 3.0 * r / 8.0) ** 2
    cap_ix = cyl_ix + 2.0 * hem_ix
    cap_iy = cyl_iy + 2.0 * hem_iy
    cap_inertia = jnp.stack([cap_ix, cap_iy, cap_ix], -1)

    mass = jnp.select(
        [stype == SPHERE, stype == BOX, stype == CAPSULE],
        [sphere_mass, box_mass, cap_mass],
        default=jnp.ones_like(r),
    )
    inertia = jnp.select(
        [(stype == SPHERE)[..., None], (stype == BOX)[..., None],
         (stype == CAPSULE)[..., None]],
        [sphere_inertia, box_inertia, cap_inertia],
        default=jnp.ones_like(sphere_inertia),
    )
    return mass, inertia


def mass_properties_np(stype: int, params: np.ndarray, density: float
                       ) -> Tuple[float, np.ndarray]:
    """Host-side scalar mass properties (numpy; used by add_body so world
    construction never dispatches device ops)."""
    params = np.asarray(params, np.float64)
    density = float(density)
    if stype == SPHERE:
        r = params[0]
        m = density * (4.0 / 3.0) * np.pi * r ** 3
        i = 0.4 * m * r * r
        return m, np.array([i, i, i], np.float32)
    if stype == BOX:
        hx, hy, hz = params[:3]
        m = density * 8.0 * hx * hy * hz
        return m, np.array([
            m / 3.0 * (hy * hy + hz * hz),
            m / 3.0 * (hx * hx + hz * hz),
            m / 3.0 * (hx * hx + hy * hy),
        ], np.float32)
    if stype == CAPSULE:
        r, hh = params[0], params[1]
        cyl_m = density * np.pi * r * r * (2.0 * hh)
        hem_m = density * (2.0 / 3.0) * np.pi * r ** 3
        m = cyl_m + 2.0 * hem_m
        cyl_iy = 0.5 * cyl_m * r * r
        cyl_ix = cyl_m * (3.0 * r * r + (2.0 * hh) ** 2) / 12.0
        hem_iy = 0.4 * hem_m * r * r
        hem_ix = hem_iy + hem_m * (hh + 3.0 * r / 8.0) ** 2
        ix = cyl_ix + 2.0 * hem_ix
        iy = cyl_iy + 2.0 * hem_iy
        return m, np.array([ix, iy, ix], np.float32)
    return 1.0, np.ones(3, np.float32)


def local_aabb(stype: Array, params: Array) -> Tuple[Array, Array]:
    """Shape-local AABB half-extent box (min, max), batched."""
    r = params[..., 0]
    box_ext = params[..., :3]
    cap_ext = jnp.stack(
        [params[..., 0], params[..., 0] + params[..., 1], params[..., 0]], -1
    )
    sphere_ext = jnp.stack([r, r, r], -1)
    big = jnp.full_like(sphere_ext, 1e9)
    ext = jnp.select(
        [(stype == SPHERE)[..., None], (stype == BOX)[..., None],
         (stype == CAPSULE)[..., None], (stype == PLANE)[..., None]],
        [sphere_ext, box_ext, cap_ext, big],
        default=jnp.zeros_like(sphere_ext),
    )
    return -ext, ext
