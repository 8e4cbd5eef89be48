"""Cascaded shadow maps.

Rebuild of CsmRenderSystem (include/garden/system/render/csm.hpp:36-90,
source/system/render/csm.cpp): 3 cascades fitted to slices of the camera
frustum (split ratios (0.1, 0.25) of shadow distance 100), depth-only
rasterization per cascade from the light's orthographic view, PCF-filtered
compare on resolve with constant+normal bias. The reference renders cascades
through IShadowMeshRenderSystem passes (mesh.cpp:795-847); here each cascade
is one depth-only raster pass at shadow-map resolution.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import ShadowConfig
from garden_tpu.render import raster

Array = jnp.ndarray


def cascade_splits(cfg: ShadowConfig, near: float) -> List[float]:
    """View-space split depths [near, s1, s2, far] (csm.hpp:89-90)."""
    d = cfg.distance
    return [near] + [r * d for r in cfg.split_ratios] + [d]


def fit_cascade(
    inv_view_proj: Array,   # camera inverse view-proj
    light_dir: Array,       # direction the light travels (sun -> scene)
    cam_near: float,
    split_near: float,
    split_far: float,
    near_clip_proj: float,
) -> Array:
    """Light view-projection fitted around one frustum slice.

    Builds the slice's 8 world-space corners from NDC via inv_view_proj
    (reverse-Z: depth = near/viewdist), then a light-space AABB -> ortho.
    """
    # reverse-Z infinite projection: ndc_z = near / dist
    z0 = near_clip_proj / jnp.maximum(split_near, near_clip_proj)
    z1 = near_clip_proj / jnp.maximum(split_far, near_clip_proj)
    corners = []
    for x in (-1.0, 1.0):
        for y in (-1.0, 1.0):
            for z in (z0, z1):
                h = inv_view_proj @ jnp.array([x, y, z, 1.0])
                corners.append(h[:3] / h[3])
    corners = jnp.stack(corners)  # (8, 3)

    center = jnp.mean(corners, axis=0)
    light_dir = m3.normalize(light_dir)
    up = jnp.where(jnp.abs(light_dir[1]) > 0.95,
                   jnp.array([1.0, 0.0, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    eye = center - light_dir * 200.0
    view = m3.look_at(eye, center, up)

    lc = m3.apply_mat4(view, corners)  # corners in light space
    lo = jnp.min(lc, axis=0)
    hi = jnp.max(lc, axis=0)
    # extend the near plane backwards to catch off-slice casters
    proj = m3.orthographic(lo[0], hi[0], lo[1], hi[1],
                           -hi[2] - 100.0, -lo[2], reverse_z=True)
    return m3.matmul(proj, view)


def render_cascades(
    world_positions: Array,
    indices: Array,
    tri_valid: Array,
    light_view_projs: List[Array],
    cfg: ShadowConfig,
    max_per_tile: int = 256,
    tri_world: Array = None,
    tri_translucent: Array = None,
    tri_tint: Array = None,
) -> Array:
    """Shadow raster per cascade -> (cascades, S, S, 8) packed maps:
    lane 0 = opaque reverse-Z depth (the D16 map, csm.hpp:56-64),
    lanes 1:4 = translucent caster transmittance tint (the sRGB translucent
    map — sunlight through tinted glass), lane 4 = nearest translucent
    caster depth, lanes 5:8 pad. Packing all planes into one 8-lane row
    keeps the resolve at ONE per-pixel row gather (gathers price per row).

    tri_world: optional pre-gathered (T, 3, 3) world triangle vertices —
    shares ONE gather across cascades and the main pass instead of a
    per-cascade clip[indices] gather. tri_translucent/tri_tint enable the
    translucent map ((T,) mask + (T, 4) rgba); omitted = opaque only."""
    size = cfg.map_size
    if tri_world is None:
        tri_world = world_positions[indices]             # (T, 3, 3)
    t = tri_world.shape[0]
    flat = tri_world.reshape(t * 3, 3)
    with_trans = tri_translucent is not None and tri_tint is not None
    maps = []
    for lvp in light_view_projs:
        tri_clip = m3.apply_mat4_h(lvp, flat).reshape(t, 3, 4)
        # front faces only: sufficient for closed casters, and it keeps the
        # same winding convention as the main pass
        opaque_mask = tri_valid & (~tri_translucent if with_trans
                                   else jnp.ones_like(tri_valid))
        setup = raster.setup_triangles_tv(tri_clip, opaque_mask, size, size)
        # foot=2: shadow casters are small in light space; a 4x smaller pair
        # emission quarters the binning sort (big tris use the global list)
        tiles, counts = raster.bin_triangles(setup, size, size, 128,
                                             max_per_tile, foot=2)
        depth = raster.rasterize_depth(setup, tiles, counts, size, size, 128)
        if with_trans:
            tsetup = raster.setup_triangles_tv(
                tri_clip, tri_valid & tri_translucent, size, size)
            ttiles, tcounts = raster.bin_triangles(
                tsetup, size, size, 128, max_per_tile // 2, foot=2)
            tdepth = raster.rasterize_depth(tsetup, ttiles, tcounts,
                                            size, size, 128)
            # transmitted tint: translucent casters blend src-over onto a
            # fully-lit white background in bin order, z-tested against
            # the opaque depth (only casters the sun reaches matter)
            tint = raster.rasterize_sorted_blend(
                tsetup, tri_tint, ttiles, tcounts, depth,
                jnp.ones((size, size, 3), jnp.float32), size, size, 128)
        else:
            tdepth = jnp.zeros_like(depth)
            tint = jnp.ones((size, size, 3), jnp.float32)
        packed = jnp.concatenate(
            [depth[..., None], tint, tdepth[..., None],
             jnp.zeros((size, size, 3), jnp.float32)], axis=-1)
        maps.append(packed)
    return jnp.stack(maps)


def resolve_shadow(
    position: Array,         # (H, W, 3) world positions
    normal: Array,           # (H, W, 3)
    view_depth: Array,       # (H, W) distance from camera (for cascade pick)
    shadow_maps: Array,      # (C, S, S, 8) packed (see render_cascades)
    light_view_projs: Array,  # (C, 4, 4)
    cfg: ShadowConfig,
    splits: List[float],
    light_dir: Array,
) -> Array:
    """PCF shadow factor (H, W, 3), (1,1,1) = fully lit: the scalar opaque
    factor times the translucent casters' transmittance tint (the csm.gsl
    resolve + translucent-map modulation)."""
    size = cfg.map_size
    c_count = shadow_maps.shape[0]

    # decimated resolve: the shadow-map lookup gather dominates; resolve at
    # half resolution and upsample the factor at the end. Decimation is a
    # dense mean-pool (a strided slice lowers to a ~3 GB/s gather on TPU).
    step = max(int(getattr(cfg, "resolve_step", 1)), 1)
    full_shape = position.shape[:2]
    if step > 1:
        from garden_tpu.ops.blur import decimate2x
        # power-of-two knob (validated in ShadowConfig): each level is one
        # 2x decimation, so step=2 -> 1 level, 4 -> 2, 8 -> 3
        for _ in range(int(np.log2(step))):
            position = decimate2x(position)
            normal = decimate2x(normal)
            view_depth = decimate2x(view_depth)

    # cascade selection by view distance
    cascade = jnp.zeros_like(view_depth, dtype=jnp.int32)
    for i in range(1, c_count):
        cascade = jnp.where(view_depth > splits[i], i, cascade)
    in_range = view_depth < splits[-1]

    # normal-offset bias (csm.hpp bias settings)
    offset_pos = position + normal * cfg.bias_normal
    hpos = jnp.concatenate([offset_pos, jnp.ones_like(position[..., :1])], -1)

    # project into EVERY cascade densely and select (a (H,W)-indexed gather
    # of per-pixel matrices lowers catastrophically on TPU; 3 dense einsums
    # + selects are ~free)
    u = jnp.zeros_like(view_depth)
    v = jnp.zeros_like(view_depth)
    z = jnp.zeros_like(view_depth)
    for i in range(c_count):
        h = m3.einsum("ij,hwj->hwi", light_view_projs[i], hpos)
        uvz = h[..., :3] / jnp.maximum(h[..., 3:4], 1e-9)
        sel = cascade == i
        u = jnp.where(sel, (uvz[..., 0] * 0.5 + 0.5) * size, u)
        v = jnp.where(sel, (0.5 - uvz[..., 1] * 0.5) * size, v)
        z = jnp.where(sel, uvz[..., 2], z)
    # reverse-Z: lenient compare (z + bias >= occ) prevents self-shadow acne
    z = z + cfg.bias_constant

    inside = (u >= 1) & (u < size - 1) & (v >= 1) & (v < size - 1)

    # single shadow-map tap + screen-space 3x3 smoothing of the binary
    # factor: per-pixel gathers cost ~15ms each at 1080p on TPU, so the PCF
    # softening moves from light space (9 gathers) to screen space (8 dense
    # shifted adds, ~free) — visually equivalent for small radii
    maps_flat = shadow_maps.reshape(-1, shadow_maps.shape[-1])
    flat = cascade * (size * size) \
        + jnp.clip(v.astype(jnp.int32), 0, size - 1) * size \
        + jnp.clip(u.astype(jnp.int32), 0, size - 1)
    row = maps_flat[flat]                     # ONE row gather: all planes
    occ = row[..., 0]
    lit = jnp.where(z >= occ, 1.0, 0.0)
    lit = jnp.where(inside & in_range, lit, 1.0)
    # translucent modulation: receivers beyond a translucent caster get its
    # transmitted tint (sRGB translucent map, csm.hpp:56-64)
    tint = jnp.where(((z < row[..., 4]) & inside & in_range)[..., None],
                     row[..., 1:4], 1.0)

    r = cfg.pcf_radius
    if r > 0:
        acc = jnp.zeros_like(lit)
        n = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                h_, w_ = lit.shape
                pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)))
                sh = jnp.pad(lit, pad, mode="edge")[
                    max(-dy, 0):max(-dy, 0) + h_, max(-dx, 0):max(-dx, 0) + w_]
                acc = acc + sh
                n += 1
        lit = acc / n
    lit = lit[..., None] * tint               # (H, W, 3)
    if step > 1:
        from garden_tpu.ops.blur import upsample2x_to
        for _ in range(int(np.log2(step))):
            target = (min(lit.shape[0] * 2, full_shape[0]),
                      min(lit.shape[1] * 2, full_shape[1]))
            lit = upsample2x_to(lit, *target)
        if lit.shape[:2] != tuple(full_shape):
            lit = upsample2x_to(lit, *full_shape)
    return lit
