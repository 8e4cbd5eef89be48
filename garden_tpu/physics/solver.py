"""Contact constraint solver: mass-splitting Jacobi impulse iterations.

Rebuild of Jolt's sequential-impulse velocity solver as stepped by the
reference (source/system/physics.cpp:1186-1193). Sequential (Gauss-Seidel)
impulses are inherently serial per island; the TPU-native formulation solves
every contact in parallel each iteration (Jacobi) with *mass splitting*
(Tonge et al., 2012): each body's effective inverse mass in the constraint
preconditioner is scaled by its contact count, which makes the parallel
update non-overshooting, while impulses are applied with the true inverse
mass via one segment-sum scatter. More iterations substitute for the
sequential sweep; SURVEY.md section 7 'Hard parts' calls this trade out
explicitly.

Features mirrored from the Jolt path: accumulated-impulse clamping, Baumgarte
positional bias with penetration slop, restitution with a bounce threshold,
Coulomb friction on two tangents bounded by the accumulated normal impulse,
sensor contacts excluded from response (physics.hpp:362 RigidbodyComponent
sensor flag), per-body linear/angular factors for DOF locking
(physics.hpp:54-65 AllowedDOF incl. Plane2D).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from garden_tpu.core import math3d as m3

Array = jnp.ndarray


def _orthonormal_tangents(n: Array) -> Tuple[Array, Array]:
    """Two unit tangents perpendicular to n (batched, branch-free)."""
    helper = jnp.where(
        (jnp.abs(n[..., 0]) > 0.9)[..., None],
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), n.shape),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), n.shape),
    )
    t1 = m3.normalize(jnp.cross(n, helper))
    t2 = jnp.cross(n, t1)
    return t1, t2


def solve_velocity(
    bodies: Dict[str, Array],
    contacts: Dict[str, Array],
    dt: float,
    *,
    iterations: int,
    baumgarte: float,
    slop: float,
    restitution_threshold: float = 0.5,
    warm: Optional[Dict[str, Array]] = None,
) -> Tuple[Array, Array, Dict[str, Array]]:
    """Solve contact constraints; returns (linvel, angvel, impulse dict).

    contacts: flattened point list with fields `a`, `b` (int32[C] body ids),
    `point` f32[C,3], `normal` f32[C,3] (A->B), `pen` f32[C], `valid` bool[C].

    `warm` carries the previous step's accumulated impulses in the same
    fixed contact-slot layout (body i, candidate k, manifold point p); for
    resting configurations the slots are stable across steps, so applying
    them up-front gives the sequential-impulse warm-starting effect stacks
    need to converge (Jolt warm-starts the same way; a stale slot after a
    topology change injects at most one frame of noise and is clamped by the
    accumulation limits).
    """
    n_bodies = bodies["pos"].shape[0]
    a = contacts["a"]
    b = contacts["b"]
    point = contacts["point"]
    normal = contacts["normal"]
    pen = contacts["pen"]
    # speculative contacts (pen<0) participate in velocity solve but get no
    # positional bias; sensors produce no response at all
    responsive = contacts["valid"] & ~(bodies["is_sensor"][a] | bodies["is_sensor"][b])

    inv_mass = bodies["inv_mass"]
    # world-space inverse inertia: R diag(I^-1) R^T
    r = m3.quat_to_mat3(bodies["quat"])
    inv_inertia_w = m3.einsum(
        "nij,nj,nkj->nik", r, bodies["inv_inertia"], r
    )

    # mass splitting: contact count per body (min 1)
    w = responsive.astype(jnp.float32)
    count = (
        jax.ops.segment_sum(w, a, num_segments=n_bodies)
        + jax.ops.segment_sum(w, b, num_segments=n_bodies)
    )
    split = jnp.maximum(count, 1.0)

    ra = point - bodies["pos"][a]
    rb = point - bodies["pos"][b]

    lin_factor = bodies["linear_factor"]
    ang_factor = bodies["angular_factor"]

    def k_for(axis: Array) -> Array:
        """Effective mass denominator along a unit axis (with splitting)."""
        ra_x = jnp.cross(ra, axis)
        rb_x = jnp.cross(rb, axis)
        ang_a = m3.einsum("cij,cj->ci", inv_inertia_w[a], ra_x * ang_factor[a])
        ang_b = m3.einsum("cij,cj->ci", inv_inertia_w[b], rb_x * ang_factor[b])
        k = (
            inv_mass[a] * split[a]
            + inv_mass[b] * split[b]
            + m3.dot(ra_x * ang_factor[a], ang_a) * split[a]
            + m3.dot(rb_x * ang_factor[b], ang_b) * split[b]
        )
        return jnp.maximum(k, 1e-9)

    t1, t2 = _orthonormal_tangents(normal)
    k_n = k_for(normal)
    k_t1 = k_for(t1)
    k_t2 = k_for(t2)

    friction = jnp.sqrt(bodies["friction"][a] * bodies["friction"][b])
    restitution = jnp.maximum(bodies["restitution"][a], bodies["restitution"][b])

    def rel_vel(linvel: Array, angvel: Array) -> Array:
        va = linvel[a] + jnp.cross(angvel[a], ra)
        vb = linvel[b] + jnp.cross(angvel[b], rb)
        return vb - va

    # restitution target from pre-solve approach speed
    vn0 = m3.dot(rel_vel(bodies["linvel"], bodies["angvel"]), normal)
    bounce = jnp.where(vn0 < -restitution_threshold, -restitution * vn0, 0.0)
    bias = (baumgarte / dt) * jnp.maximum(pen - slop, 0.0)
    target_vn = jnp.maximum(bounce, bias)

    def apply(linvel, angvel, impulse):
        """Scatter impulse vectors (C,3) applied at contact points."""
        dlin = (
            jax.ops.segment_sum(-impulse * inv_mass[a][:, None], a, num_segments=n_bodies)
            + jax.ops.segment_sum(impulse * inv_mass[b][:, None], b, num_segments=n_bodies)
        )
        torque_a = jax.ops.segment_sum(jnp.cross(ra, -impulse), a, num_segments=n_bodies)
        torque_b = jax.ops.segment_sum(jnp.cross(rb, impulse), b, num_segments=n_bodies)
        dang = m3.einsum("nij,nj->ni", inv_inertia_w, torque_a + torque_b)
        return (
            linvel + dlin * lin_factor,
            angvel + dang * ang_factor,
        )

    def iteration(_, carry):
        linvel, angvel, acc_n, acc_t1, acc_t2 = carry

        v = rel_vel(linvel, angvel)
        vn = m3.dot(v, normal)

        # normal impulse with accumulation clamp >= 0
        dlam = (target_vn - vn) / k_n
        new_acc = jnp.maximum(acc_n + dlam, 0.0)
        dlam = jnp.where(responsive, new_acc - acc_n, 0.0)
        acc_n = jnp.where(responsive, new_acc, acc_n)
        linvel, angvel = apply(linvel, angvel, dlam[:, None] * normal)

        # friction, bounded by mu * normal impulse
        v = rel_vel(linvel, angvel)
        max_f = friction * acc_n
        dt1 = -m3.dot(v, t1) / k_t1
        new_t1 = jnp.clip(acc_t1 + dt1, -max_f, max_f)
        dt1 = jnp.where(responsive, new_t1 - acc_t1, 0.0)
        acc_t1 = jnp.where(responsive, new_t1, acc_t1)
        dt2 = -m3.dot(v, t2) / k_t2
        new_t2 = jnp.clip(acc_t2 + dt2, -max_f, max_f)
        dt2 = jnp.where(responsive, new_t2 - acc_t2, 0.0)
        acc_t2 = jnp.where(responsive, new_t2, acc_t2)
        linvel, angvel = apply(
            linvel, angvel, dt1[:, None] * t1 + dt2[:, None] * t2
        )

        return linvel, angvel, acc_n, acc_t1, acc_t2

    zeros = jnp.zeros_like(pen)
    linvel0, angvel0 = bodies["linvel"], bodies["angvel"]
    if warm is not None:
        acc_n0 = jnp.where(responsive, warm["n"], 0.0)
        acc_t10 = jnp.where(responsive, warm["t1"], 0.0)
        acc_t20 = jnp.where(responsive, warm["t2"], 0.0)
        linvel0, angvel0 = apply(
            linvel0, angvel0,
            acc_n0[:, None] * normal + acc_t10[:, None] * t1 + acc_t20[:, None] * t2,
        )
    else:
        acc_n0 = acc_t10 = acc_t20 = zeros

    linvel, angvel, acc_n, acc_t1, acc_t2 = jax.lax.fori_loop(
        0, iterations, iteration,
        (linvel0, angvel0, acc_n0, acc_t10, acc_t20),
    )
    return linvel, angvel, {"n": acc_n, "t1": acc_t1, "t2": acc_t2}


def solve_position(
    pos: Array,
    bodies: Dict[str, Array],
    contacts: Dict[str, Array],
    pen: Array,
    *,
    iterations: int,
    slop: float,
    beta: float = 0.8,
) -> Array:
    """Positional (split-impulse) penetration correction.

    The Jolt analog is its position solver pass after the velocity solve.
    Linear-only Jacobi projection with mass splitting: each iteration pushes
    penetrating pairs apart along the contact normal without injecting
    momentum (velocities are untouched). `pen` is the penetration measured at
    the *current* `pos` (callers adjust the collide-time value by any
    integration displacement).
    """
    n_bodies = pos.shape[0]
    a, b = contacts["a"], contacts["b"]
    normal = contacts["normal"]
    responsive = contacts["valid"] & ~(bodies["is_sensor"][a] | bodies["is_sensor"][b])
    inv_mass = bodies["inv_mass"]

    w = responsive.astype(jnp.float32)
    count = (
        jax.ops.segment_sum(w, a, num_segments=n_bodies)
        + jax.ops.segment_sum(w, b, num_segments=n_bodies)
    )
    split = jnp.maximum(count, 1.0)
    k = jnp.maximum(inv_mass[a] * split[a] + inv_mass[b] * split[b], 1e-9)
    lin_factor = bodies["linear_factor"]

    def iteration(_, carry):
        pos, corr = carry
        sep = pen - corr
        lam = jnp.where(responsive, beta * jnp.maximum(sep - slop, 0.0) / k, 0.0)
        push = lam[:, None] * normal
        dpos = (
            jax.ops.segment_sum(-push * inv_mass[a][:, None], a, num_segments=n_bodies)
            + jax.ops.segment_sum(push * inv_mass[b][:, None], b, num_segments=n_bodies)
        ) * lin_factor
        pos = pos + dpos
        corr = corr + m3.dot(dpos[b] - dpos[a], normal)
        return pos, corr

    pos, _ = jax.lax.fori_loop(0, iterations, iteration, (pos, jnp.zeros_like(pen)))
    return pos
