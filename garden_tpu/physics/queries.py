"""Ray and shape queries against the body arrays.

Rebuild of the narrow-phase query API the reference exposes (PhysicsSystem
ray AND shape casts via Jolt's NarrowPhaseQuery, physics.hpp castRay/castShape
sections). Vectorized: one query is tested against every body analytically
and the nearest hit wins — at fixed capacities this is faster on TPU than a
tree walk.

Supported:
- `cast_ray`: exact sphere/box/plane/capsule/hull/compound/mesh hits with
  surface normals; heightfields via fixed-count raymarch refinement.
- `cast_sphere`: swept-sphere cast (the CharacterVirtual walk-stairs /
  stick-to-floor primitive, character.cpp:265-272) against every shape
  class: exact Minkowski inflation for sphere/box/plane/capsule, inflated
  face planes for hulls (conservative by at most r at edges), per-child
  inflation for compounds, fixed-count march for heightfields and meshes.
- `cast_shape`: generic swept cast of ANY supported shape (box, capsule,
  hull, compound...) by conservative advancement over the narrowphase's
  signed pair distances — the castShape analog of the reference's
  NarrowPhaseQuery. Distances from sampled kernels (heightfield/mesh) are
  sampled lower bounds; the per-iteration advance is clamped so thin
  features are not skipped.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

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


def _ray_capsule(o, d, p0, p1, radius):
    """Exact ray vs capsule: infinite-cylinder intersection clamped to the
    segment span, plus the two sphere caps."""
    axis = p1 - p0
    ll = m3.dot(axis, axis)
    u = axis / jnp.sqrt(jnp.maximum(ll, 1e-12))[..., None]
    oc = o - p0
    # components perpendicular to the axis
    d_perp = d - u * m3.dot(d, u)[..., None]
    oc_perp = oc - u * m3.dot(oc, u)[..., None]
    a = m3.dot(d_perp, d_perp)
    b = m3.dot(d_perp, oc_perp)
    c = m3.dot(oc_perp, oc_perp) - radius * radius
    disc = b * b - a * c
    safe_a = jnp.maximum(a, 1e-12)
    t_cyl = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / safe_a
    # point on axis at the cylinder hit must lie within the segment
    s = m3.dot(oc + d * t_cyl[..., None], u)
    seg_len = jnp.sqrt(jnp.maximum(ll, 1e-12))
    cyl_ok = (disc >= 0) & (a > 1e-12) & (t_cyl > 0) & (s >= 0) & (s <= seg_len)
    t_cyl = jnp.where(cyl_ok, t_cyl, NO_HIT)
    t0 = _ray_sphere(o, d, p0, radius)
    t1 = _ray_sphere(o, d, p1, radius)
    return jnp.minimum(t_cyl, jnp.minimum(t0, t1))


def _ray_hull(o, d, pos, quat, params, tables):
    """Ray vs convex polytope: generalized slab test over face planes."""
    verts_w, vv, faces_w, fv = _hull_world_rows(pos, quat, params, tables)
    dots = m3.einsum("...fi,...pi->...fp", faces_w, verts_w)
    d_f = jnp.max(jnp.where(vv[..., None, :], dots, -1e30), axis=-1)
    no = m3.einsum("...fi,...i->...f", faces_w, o)
    nd = m3.einsum("...fi,...i->...f", faces_w, d)
    # entering planes (nd < 0) give t_near, exiting give t_far
    t_plane = (d_f - no) / jnp.where(jnp.abs(nd) < 1e-9,
                                     jnp.where(nd < 0, -1e-9, 1e-9), nd)
    t_near = jnp.max(jnp.where(fv & (nd < 0), t_plane, -NO_HIT), axis=-1)
    t_far = jnp.min(jnp.where(fv & (nd > 0), t_plane, NO_HIT), axis=-1)
    # a ray starting outside any face with nd >= 0 never enters that plane
    outside_parallel = jnp.any(fv & (jnp.abs(nd) <= 1e-9) & (no > d_f), axis=-1)
    hit = (t_near <= t_far) & (t_near > 0) & ~outside_parallel
    return jnp.where(hit, t_near, NO_HIT)


def _hull_world_rows(pos, quat, params, tables):
    hidx = params[..., 0].astype(jnp.int32) % tables["hull_verts"].shape[0]
    verts_l = tables["hull_verts"][hidx]
    vvalid = tables["hull_vert_valid"][hidx]
    faces_l = tables["hull_face_n"][hidx]
    fvalid = tables["hull_face_valid"][hidx]
    rot = m3.quat_to_mat3(quat)
    verts_w = m3.einsum("...ij,...kj->...ki", rot, verts_l) + pos[..., None, :]
    faces_w = m3.einsum("...ij,...kj->...ki", rot, faces_l)
    return verts_w, vvalid, faces_w, fvalid


def _ray_heightfield(o, d, pos, quat, params, tables, steps: int = 32,
                     max_t: float = None, max_distance: float = 1e6):
    """Fixed-count raymarch against the height grid: finds the first sample
    below the surface and refines by one bisection round.

    The march range adapts to the caller: the ray is first clipped to the
    grid's world-span cylinder (nx*cell wide) capped at `max_distance`, so
    terrain beyond the old fixed 100-unit window still resolves; precision
    is range/steps per sample with one bisection (document for callers that
    need thin-ridge accuracy: raise `steps`)."""
    from garden_tpu.physics.narrowphase import _hf_plane_at
    rot = m3.quat_to_mat3(quat)
    o_l = m3.einsum("...ji,...j->...i", rot, o - pos)
    d_l = m3.einsum("...ji,...j->...i", rot, d)

    def below(t):
        p = o_l + d_l * t[..., None]
        n_l, p_on, inside = _hf_plane_at(p, params, tables)
        return (m3.dot(n_l, p - p_on) < 0.0) & inside, inside

    if max_t is None:
        # clip to the grid extent: enter/exit of the XZ slab of the grid
        span = params[..., 1] * jnp.maximum(params[..., 2], params[..., 3])
        half = 0.5 * span + 1.0
        t_reach = jnp.minimum(
            m3.length(o_l) + half * 1.732, jnp.float32(max_distance))
        ts = jnp.linspace(0.0, 1.0, steps)[:, None] * t_reach[None, ...]
    else:
        ts = jnp.broadcast_to(
            jnp.linspace(0.0, float(max_t), steps)[:, None],
            (steps,) + o_l.shape[:-1])
    t_hit = jnp.full(o_l.shape[:-1], NO_HIT)
    prev_t = jnp.zeros(o_l.shape[:-1])
    found = jnp.zeros(o_l.shape[:-1], bool)
    for i in range(steps):
        t = jnp.broadcast_to(ts[i], o_l.shape[:-1])
        b, _ = below(t)
        first = b & ~found
        # bisect once between prev and t
        mid = 0.5 * (prev_t + t)
        bm, _ = below(mid)
        t_ref = jnp.where(bm, mid, t)
        t_hit = jnp.where(first, t_ref, t_hit)
        found = found | b
        prev_t = t
    return t_hit




def _ray_hull_inflated(o, d, pos, quat, params, tables, r):
    """Ray vs hull with every face plane pushed out by r (the Minkowski sum
    of hull and sphere minus its rounded edges — conservative by <= r)."""
    verts_w, vv, faces_w, fv = _hull_world_rows(pos, quat, params, tables)
    dots = m3.einsum("...fi,...pi->...fp", faces_w, verts_w)
    d_f = jnp.max(jnp.where(vv[..., None, :], dots, -1e30), axis=-1) + r
    no = m3.einsum("...fi,...i->...f", faces_w, o)
    nd = m3.einsum("...fi,...i->...f", faces_w, d)
    t_plane = (d_f - no) / jnp.where(jnp.abs(nd) < 1e-9,
                                     jnp.where(nd < 0, -1e-9, 1e-9), nd)
    t_near = jnp.max(jnp.where(fv & (nd < 0), t_plane, -NO_HIT), axis=-1)
    t_far = jnp.min(jnp.where(fv & (nd > 0), t_plane, NO_HIT), axis=-1)
    outside_parallel = jnp.any(fv & (jnp.abs(nd) <= 1e-9) & (no > d_f), axis=-1)
    hit = (t_near <= t_far) & (t_near > 0) & ~outside_parallel
    return jnp.where(hit, t_near, NO_HIT)


def _compound_children_world_q(pos, quat, params, tables):
    """(ctype, cparams, cpos_w, cquat_w) for compound rows (query-side)."""
    cidx = params[..., 0].astype(jnp.int32) % tables["comp_type"].shape[0]
    ctype = tables["comp_type"][cidx]                  # (..., K)
    cparams = tables["comp_params"][cidx]
    cpos = tables["comp_pos"][cidx]
    cquat = tables["comp_quat"][cidx]
    cpos_w = m3.quat_rotate(quat[..., None, :], cpos) + pos[..., None, :]
    cquat_w = m3.quat_mul(quat[..., None, :], cquat)
    return ctype, cparams, cpos_w, cquat_w


def _ray_compound(o, d, pos, quat, params, tables, r=0.0):
    """Ray (optionally sphere-inflated by r) vs compound: min over children."""
    ctype, cparams, cpos_w, cquat_w = _compound_children_world_q(
        pos, quat, params, tables)
    t_best = jnp.full(pos.shape[:-1], NO_HIT)
    kmax = ctype.shape[-1]
    for k in range(kmax):
        tk = ctype[..., k]
        pk, qk, prmk = cpos_w[..., k, :], cquat_w[..., k, :], cparams[..., k, :]
        rotk = m3.quat_to_mat3(qk)
        ts = _ray_sphere(o, d, pk, prmk[..., 0] + r)
        tb = _ray_box(o, d, pk, rotk, prmk[..., :3] + r)
        axisk = m3.quat_rotate(qk, jnp.broadcast_to(
            jnp.array([0.0, 1.0, 0.0]), pk.shape))
        tc = _ray_capsule(o, d, pk - axisk * prmk[..., 1:2],
                          pk + axisk * prmk[..., 1:2], prmk[..., 0] + r)
        tkid = jnp.select([tk == sh.SPHERE, tk == sh.BOX, tk == sh.CAPSULE],
                          [ts, tb, tc], default=jnp.full_like(ts, NO_HIT))
        t_best = jnp.minimum(t_best, tkid)
    return t_best


def _ray_mesh(o, d, pos, quat, params, tables, steps: int = 32,
              max_t: float = 1e6, inflate: float = 0.0):
    """Ray vs triangle mesh: fixed-step march through the local grid; at
    each step the containing cell's bucket is tested exactly
    (Moller-Trumbore). inflate > 0 turns it into an approximate swept
    sphere (triangle planes offset along the ray's approach).

    Range note: the march is bounded to the mesh's local grid span (the ray
    is first clipped to the grid AABB), so distant meshes resolve exactly
    regardless of max_t."""
    rot = m3.quat_to_mat3(quat)
    o_l = m3.einsum("...ji,...j->...i", rot, o - pos)
    d_l = m3.einsum("...ji,...j->...i", rot, d)
    midx = params[..., 0].astype(jnp.int32) % tables["mesh_info"].shape[0]
    info = tables["mesh_info"][midx]
    origin = info[..., 0:3]
    cell = info[..., 3]
    g3 = tables["mesh_cells"].shape[1]
    g_dim = int(round(g3 ** (1.0 / 3.0)))
    while g_dim ** 3 < g3:
        g_dim += 1
    span = cell * g_dim

    # clip ray to grid AABB [origin, origin + span]
    inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-9,
                          jnp.where(d_l < 0, -1e-9, 1e-9), d_l)
    t0 = (origin - o_l) * inv
    t1 = (origin + span[..., None] - o_l) * inv
    tmin = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), 0.0)
    tmax = jnp.minimum(jnp.min(jnp.maximum(t0, t1), axis=-1), max_t)
    misses = tmax <= tmin

    step = (tmax - tmin) / steps
    t_best = jnp.full(o_l.shape[:-1], NO_HIT)
    for i in range(steps):
        t = tmin + (i + 0.5) * step
        p = o_l + d_l * t[..., None]
        c_idx = jnp.clip(((p - origin) / cell[..., None]).astype(jnp.int32),
                         0, g_dim - 1)
        ckey = (c_idx[..., 0] * g_dim + c_idx[..., 1]) * g_dim + c_idx[..., 2]
        bucket = tables["mesh_cells"][midx, ckey]        # (..., B)
        tri = tables["mesh_tris"][midx[..., None], jnp.maximum(bucket, 0)]
        va, vb, vc = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
        # static guard only: inflate may be a traced per-entity radius
        # (character probes pass comp["radius"]); a Python `if` on it
        # fails under vmap — apply the offset unconditionally then
        if not (isinstance(inflate, (int, float)) and inflate == 0.0):
            nf = m3.normalize(jnp.cross(vb - va, vc - va))
            off = nf * inflate
            va, vb, vc = va + off, vb + off, vc + off
        e1 = vb - va
        e2 = vc - va
        dl = d_l[..., None, :]
        ol = o_l[..., None, :]
        pv = jnp.cross(dl, e2)
        det = m3.dot(e1, pv)
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)
        tv = ol - va
        u = m3.dot(tv, pv) * inv_det
        qv = jnp.cross(tv, e1)
        v = m3.dot(dl, qv) * inv_det
        t_tri = m3.dot(e2, qv) * inv_det
        ok = (bucket >= 0) & (jnp.abs(det) > 1e-9) & (u >= -1e-5) \
            & (v >= -1e-5) & (u + v <= 1.0 + 1e-5) & (t_tri > 0.0) \
            & (t_tri <= (t + step)[..., None])  # only hits this step reached
        t_tri = jnp.where(ok, t_tri, NO_HIT)
        t_best = jnp.minimum(t_best, jnp.min(t_tri, axis=-1))
    return jnp.where(misses, NO_HIT, t_best)


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
    axis = m3.quat_rotate(b["quat"], jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0]), b["pos"].shape))
    a0 = b["pos"] - axis * params[..., 1:2]
    a1 = b["pos"] + axis * params[..., 1:2]
    t_cap = _ray_capsule(o, d, a0, a1, params[..., 0])
    t_hull = _ray_hull(o, d, b["pos"], b["quat"], params, shapes_t)
    t_hf = _ray_heightfield(o, d, b["pos"], b["quat"], params, shapes_t,
                            max_distance=max_distance)
    t_comp = _ray_compound(o, d, b["pos"], b["quat"], params, shapes_t)
    t_mesh = _ray_mesh(o, d, b["pos"], b["quat"], params, shapes_t,
                       max_t=max_distance)

    t = jnp.select(
        [stype == sh.SPHERE, stype == sh.BOX, stype == sh.PLANE,
         stype == sh.CAPSULE, stype == sh.HULL, stype == sh.HEIGHTFIELD,
         stype == sh.COMPOUND, stype == sh.MESH],
        [t_sphere, t_box, t_plane, t_cap, t_hull, t_hf, t_comp, t_mesh],
        default=jnp.full_like(t_sphere, NO_HIT),
    )
    t = jnp.where(b["has"] & (t <= max_distance), t, NO_HIT)

    best = jnp.argmin(t)
    t_best = t[best]
    hit = t_best < NO_HIT
    point = origin + m3.normalize(direction) * t_best

    # surface normal at the hit point, per shape type
    center = b["pos"][best]
    # box: face whose local |coord| is closest to its half extent
    p_l = m3.einsum("ji,j->i", rot[best], point - center)
    h_l = params[best, :3]
    depth = jnp.abs(h_l) - jnp.abs(p_l)
    face = jnp.argmin(depth)
    n_box_l = jnp.zeros(3).at[face].set(jnp.sign(p_l[face]))
    n_box = m3.einsum("ij,j->i", rot[best], n_box_l)
    # capsule: from nearest segment point
    seg = _closest_on_segment_single(a0[best], a1[best], point)
    n_cap = m3.normalize(point - seg)
    # hull: deepest face plane at the hit
    verts_w, vv, faces_w, fv = _hull_world_rows(
        b["pos"][best], b["quat"][best], params[best], shapes_t)
    dots = m3.einsum("fi,pi->fp", faces_w, verts_w)
    d_f = jnp.max(jnp.where(vv[None, :], dots, -1e30), axis=-1)
    s_f = jnp.where(fv, m3.einsum("fi,i->f", faces_w, point) - d_f, -jnp.inf)
    n_hull = faces_w[jnp.argmax(s_f)]
    # heightfield: local surface plane under the hit
    from garden_tpu.physics.narrowphase import _hf_plane_at
    hfp_l = m3.einsum("ji,j->i", rot[best], point - center)
    n_hf_l, _, _ = _hf_plane_at(hfp_l, params[best], shapes_t)
    n_hf = m3.einsum("ij,j->i", rot[best], n_hf_l)

    n_hit = jnp.select(
        [stype[best] == sh.SPHERE, stype[best] == sh.PLANE,
         stype[best] == sh.BOX, stype[best] == sh.CAPSULE,
         stype[best] == sh.HULL, stype[best] == sh.HEIGHTFIELD],
        [m3.normalize(point - center), n_w[best], n_box, n_cap, n_hull, n_hf],
        default=m3.normalize(point - center),
    )
    return RayHit(hit=hit, body=jnp.where(hit, best, -1),
                  distance=t_best, point=point, normal=n_hit)


def _closest_on_segment_single(a0, a1, p):
    d = a1 - a0
    t = jnp.dot(p - a0, d) / jnp.maximum(jnp.dot(d, d), 1e-12)
    return a0 + d * jnp.clip(t, 0.0, 1.0)


def cast_sphere(state: Dict[str, Any], origin: Array, direction: Array,
                radius: float, max_distance: float = 1e6,
                exclude_body: int = -1) -> RayHit:
    """Swept-sphere cast: nearest time-of-impact against all alive bodies.

    Exact by Minkowski inflation: a sphere of radius r swept along a ray hits
    shape S exactly when the ray hits S inflated by r (sphere->sphere sum,
    plane offset, capsule radius sum; boxes get rounded-edge inflation
    approximated by the inflated slab — conservative by at most r at
    corners). This is the walk-stairs/stick-to-floor primitive
    (character.cpp:265-272)."""
    b = state["bodies"]
    shapes_t = state["shapes"]
    stype = shapes_t["type"][b["shape"]]
    params = shapes_t["params"][b["shape"]]
    o = jnp.broadcast_to(origin, b["pos"].shape)
    dirn = m3.normalize(direction)
    d = jnp.broadcast_to(dirn, b["pos"].shape)
    r = jnp.float32(radius)

    rot = m3.quat_to_mat3(b["quat"])
    t_sphere = _ray_sphere(o, d, b["pos"], params[..., 0] + r)
    t_box = _ray_box(o, d, b["pos"], rot, params[..., :3] + r)
    n_w = m3.quat_rotate(b["quat"], params[..., :3])
    d_w = params[..., 3] - m3.dot(n_w, b["pos"])
    t_plane = _ray_plane(o, d, n_w, d_w + r)
    axis = m3.quat_rotate(b["quat"], jnp.broadcast_to(
        jnp.array([0.0, 1.0, 0.0]), b["pos"].shape))
    a0 = b["pos"] - axis * params[..., 1:2]
    a1 = b["pos"] + axis * params[..., 1:2]
    t_cap = _ray_capsule(o, d, a0, a1, params[..., 0] + r)
    # heightfield: march the sphere center, offset the surface by r along up
    t_hf = _ray_heightfield(o - jnp.array([0.0, 1.0, 0.0]) * r, d,
                            b["pos"], b["quat"], params, shapes_t,
                            max_distance=max_distance)
    # hull: inflated face planes (round-2 gap: hull/compound targets were
    # missing entirely, so a character on hull stairs got NO_HIT probes)
    t_hull = _ray_hull_inflated(o, d, b["pos"], b["quat"], params, shapes_t,
                                r)
    t_comp = _ray_compound(o, d, b["pos"], b["quat"], params, shapes_t, r=r)
    t_mesh = _ray_mesh(o, d, b["pos"], b["quat"], params, shapes_t,
                       max_t=max_distance, inflate=radius)

    t = jnp.select(
        [stype == sh.SPHERE, stype == sh.BOX, stype == sh.PLANE,
         stype == sh.CAPSULE, stype == sh.HEIGHTFIELD, stype == sh.HULL,
         stype == sh.COMPOUND, stype == sh.MESH],
        [t_sphere, t_box, t_plane, t_cap, t_hf, t_hull, t_comp, t_mesh],
        default=jnp.full_like(t_sphere, NO_HIT),
    )
    idx = jnp.arange(t.shape[0])
    t = jnp.where(b["has"] & (t <= max_distance) & (idx != exclude_body),
                  t, NO_HIT)

    best = jnp.argmin(t)
    t_best = t[best]
    hit = t_best < NO_HIT
    center_at_hit = origin + dirn * t_best
    # contact normal: from the closest point on the (uninflated) shape
    box_l = m3.einsum("ji,j->i", rot[best], center_at_hit - b["pos"][best])
    box_cl = jnp.clip(box_l, -params[best, :3], params[best, :3])
    box_support = m3.einsum("ij,j->i", rot[best], box_cl) + b["pos"][best]
    support = jnp.select(
        [(stype[best] == sh.SPHERE)[..., None],
         (stype[best] == sh.BOX)[..., None]],
        [b["pos"][best], box_support],
        default=_closest_on_segment_single(a0[best], a1[best], center_at_hit),
    )
    n_generic = m3.normalize(center_at_hit - support)
    # hull: deepest face plane at the swept-center position
    verts_w, vvq, faces_w, fvq = _hull_world_rows(
        b["pos"][best], b["quat"][best], params[best], shapes_t)
    dots_q = m3.einsum("fi,pi->fp", faces_w, verts_w)
    d_fq = jnp.max(jnp.where(vvq[None, :], dots_q, -1e30), axis=-1)
    s_fq = jnp.where(fvq, m3.einsum("fi,i->f", faces_w, center_at_hit) - d_fq,
                     -jnp.inf)
    n_hull_q = faces_w[jnp.argmax(s_fq)]
    n_hit = jnp.select(
        [stype[best] == sh.PLANE, stype[best] == sh.HEIGHTFIELD,
         stype[best] == sh.HULL],
        [n_w[best], jnp.array([0.0, 1.0, 0.0]), n_hull_q],
        default=n_generic,
    )
    point = center_at_hit - n_hit * radius
    return RayHit(hit=hit, body=jnp.where(hit, best, -1),
                  distance=t_best, point=point, normal=n_hit)


def cast_shape(state: Dict[str, Any], shape_index, origin: Array,
               rotation: Array, direction: Array, max_distance: float = 1e6,
               steps: int = 12, exclude_body: int = -1,
               present_types=None) -> RayHit:
    """Generic swept-shape cast by conservative advancement — the castShape
    analog of the reference's NarrowPhaseQuery (SURVEY 2.6). Sweeps the
    ShapeTable shape `shape_index` at orientation `rotation` from `origin`
    along `direction`, against every alive body, using the narrowphase's
    signed pair distances (negative penetration = separation along the
    best axis, a valid conservative lower bound of the true distance).

    Works for every shape pair the narrowphase supports — box, capsule,
    hull, compound vs anything including heightfield and mesh. Sampled
    kernels (heightfield/mesh) provide sampled lower bounds, so each
    advance is additionally clamped to `max_advance` (default: an eighth
    of max_distance) to avoid overshooting thin features.

    Fixed `steps` conservative-advancement iterations; returns the nearest
    time of impact (distance along `direction`), contact normal (pointing
    from the swept shape toward the hit body), and contact point.
    """
    import jax

    from garden_tpu.physics import narrowphase as nph

    b = state["bodies"]
    shapes_t = state["shapes"]
    n = b["pos"].shape[0]
    stype_all = shapes_t["type"][b["shape"]]
    params_all = shapes_t["params"][b["shape"]]
    stype_a = shapes_t["type"][shape_index]
    params_a = shapes_t["params"][shape_index]
    dirn = m3.normalize(direction)
    rot_q = jnp.asarray(rotation, jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    pair_i = jnp.full((n,), n, jnp.int32)
    pair_valid = b["has"] & (idx != exclude_body)
    st = jnp.concatenate([stype_all, stype_a[None]])
    pr = jnp.concatenate([params_all, params_a[None]])
    quat_all = jnp.concatenate([b["quat"], rot_q[None]], axis=0)
    big_margin = jnp.float32(1e6)   # keep raw signed distances, no gating

    def pair_distances(t):
        pos_all = jnp.concatenate(
            [b["pos"], (origin + dirn * t)[None]], axis=0)
        man = nph.generate_contacts(
            pos_all, quat_all, st, pr, pair_i, idx, pair_valid,
            margin=big_margin, present_types=present_types, tables=shapes_t)
        pen = jnp.where(man["pen"] > -1e29, man["pen"], -1e30)  # (n, 4)
        best_pt = jnp.argmax(pen, axis=-1)
        pen_b = jnp.max(pen, axis=-1)                          # (n,)
        nrm = m3.gather_rows(man["normal"], best_pt[:, None])[:, 0]
        pt = m3.gather_rows(man["point"], best_pt[:, None])[:, 0]
        # normal convention: A->B with canonical type order; flip rows
        # where the virtual body is B so the normal points cast->body
        flip = (man["a"] != pair_i)[:, None]
        nrm = jnp.where(flip, -nrm, nrm)
        return pen_b, nrm, pt

    tol = 1e-3
    max_adv = max_distance / 8.0

    def body_fn(_, carry):
        t, done = carry
        pen_b, nrm, _ = pair_distances(t)
        sep = jnp.maximum(-pen_b, 0.0)                 # distance lower bound
        vn = m3.dot(jnp.broadcast_to(dirn, nrm.shape), nrm)  # approach rate
        touching = pen_b >= -tol
        adv = jnp.where(pair_valid & (vn > 1e-6) & ~touching,
                        sep / jnp.maximum(vn, 1e-6), NO_HIT)
        hit_now = jnp.any(pair_valid & touching)
        dt = jnp.clip(jnp.min(adv), 0.0, max_adv)
        t_new = jnp.where(done | hit_now, t, jnp.minimum(t + dt, max_distance))
        return t_new, done | hit_now

    t, done = jax.lax.fori_loop(
        0, steps, body_fn, (jnp.float32(0.0), jnp.bool_(False)))
    pen_b, nrm, pt = pair_distances(t)
    pen_b = jnp.where(pair_valid, pen_b, -1e30)
    best = jnp.argmax(pen_b)
    hit = (pen_b[best] >= -tol) & (t < max_distance)
    return RayHit(hit=hit, body=jnp.where(hit, best, -1), distance=t,
                  point=pt[best], normal=nrm[best])
