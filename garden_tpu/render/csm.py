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
    # ONE batched transform for all cascades (three separate apply_mat4_h
    # calls cost ~2.3 ms of reshape copies at 123K tris)
    c_count = len(light_view_projs)
    lvp_all = jnp.stack(list(light_view_projs))          # (C, 4, 4)
    hpos = jnp.concatenate([flat, jnp.ones_like(flat[..., :1])], axis=-1)
    clip_all = m3.einsum("cij,vj->cvi", lvp_all, hpos)   # (C, V, 4)

    # CASCADE ATLAS: all cascades raster side by side in one (S, C*S)
    # target — one binning pass + one Pallas launch instead of three
    # (per-cascade binning fixed costs measured ~8 ms/frame at 2048^2).
    # Triangles carry their cascade index so clipped geometry extending
    # past its ortho bounds cannot bleed into the neighbor's region
    # (the atlas guard in raster._depth_kernel).
    opaque_mask = tri_valid & (~tri_translucent if with_trans
                               else jnp.ones_like(tri_valid))
    fields = {k: [] for k in ("sx", "sy", "z", "inv_w", "inv_area",
                              "xmin", "xmax", "ymin", "ymax", "valid")}
    for ci in range(c_count):
        s_i = raster.setup_triangles_tv(clip_all[ci].reshape(t, 3, 4),
                                        opaque_mask, size, size)
        off = jnp.float32(ci * size)
        s_i["sx"] = s_i["sx"] + off
        s_i["xmin"] = s_i["xmin"] + off
        s_i["xmax"] = s_i["xmax"] + off
        for k in fields:
            fields[k].append(s_i[k])
    atlas_setup = {k: jnp.concatenate(v, axis=0) for k, v in fields.items()}
    tri_atlas = jnp.repeat(jnp.arange(c_count, dtype=jnp.int32), t)
    tiles, counts = raster.bin_triangles(atlas_setup, c_count * size, size,
                                         128, max_per_tile, foot=2)
    atlas_depth = raster.rasterize_depth(atlas_setup, tiles, counts,
                                         c_count * size, size, 128,
                                         atlas_span=size,
                                         tri_atlas=tri_atlas)
    # (S, C*S) -> (C, S, S)
    depth_all = jnp.swapaxes(
        atlas_depth.reshape(size, c_count, size), 0, 1)

    maps = []
    for ci in range(c_count):
        depth = depth_all[ci]
        if with_trans:
            tri_clip = clip_all[ci].reshape(t, 3, 4)
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

    # decimated resolve: the shadow-map lookup gather is latency-bound per
    # pixel (full-res packed-row taps measured 46 ms/frame at 1080p), so
    # the compare tap runs every `resolve_step` pixels and the factor
    # upsamples DEPTH-GUIDED (joint bilateral) so silhouettes stay crisp
    # at geometry edges. The translucent tint map is low-frequency and
    # always resolves at >= quarter density.
    step = max(int(getattr(cfg, "resolve_step", 1)), 1)
    full_shape = position.shape[:2]
    view_depth_full = view_depth
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
    # depth compare: SCALAR tap from a contiguous depth plane (scalar
    # gathers price per element; 8-lane packed rows at full res cost 3x)
    depth_plane = shadow_maps[..., 0].reshape(-1)
    flat = cascade * (size * size) \
        + jnp.clip(v.astype(jnp.int32), 0, size - 1) * size \
        + jnp.clip(u.astype(jnp.int32), 0, size - 1)
    occ = depth_plane[flat]
    lit = jnp.where(z >= occ, 1.0, 0.0)
    lit = jnp.where(inside & in_range, lit, 1.0)

    # translucent modulation at quarter density (the tint map is
    # low-frequency): recompute the projection on further-decimated
    # positions — strided slices of the full-res index arrays lower to
    # slow gathers on TPU (~6 ms measured), dense decimation + a small
    # re-projection is ~free
    from garden_tpu.ops.blur import bilateral_upsample_to, decimate2x
    tsub = max(4 // step, 1)
    if tsub > 1:
        pos_t, nrm_t, vd_t = position, normal, view_depth
        for _ in range(int(np.log2(tsub))):
            pos_t = decimate2x(pos_t)
            nrm_t = decimate2x(nrm_t)
            vd_t = decimate2x(vd_t)
        casc_t = jnp.zeros_like(vd_t, dtype=jnp.int32)
        for i in range(1, c_count):
            casc_t = jnp.where(vd_t > splits[i], i, casc_t)
        hpos_t = jnp.concatenate(
            [pos_t + nrm_t * cfg.bias_normal,
             jnp.ones_like(pos_t[..., :1])], -1)
        u_t = jnp.zeros_like(vd_t)
        v_t = jnp.zeros_like(vd_t)
        z_t = jnp.zeros_like(vd_t)
        for i in range(c_count):
            h_i = m3.einsum("ij,hwj->hwi", light_view_projs[i], hpos_t)
            uvz = h_i[..., :3] / jnp.maximum(h_i[..., 3:4], 1e-9)
            sel = casc_t == i
            u_t = jnp.where(sel, (uvz[..., 0] * 0.5 + 0.5) * size, u_t)
            v_t = jnp.where(sel, (0.5 - uvz[..., 1] * 0.5) * size, v_t)
            z_t = jnp.where(sel, uvz[..., 2], z_t)
        z_t = z_t + cfg.bias_constant
        ok_t = ((u_t >= 1) & (u_t < size - 1) & (v_t >= 1)
                & (v_t < size - 1) & (vd_t < splits[-1]))
        flat_t = casc_t * (size * size) \
            + jnp.clip(v_t.astype(jnp.int32), 0, size - 1) * size \
            + jnp.clip(u_t.astype(jnp.int32), 0, size - 1)
    else:
        flat_t, z_t, ok_t = flat, z, inside & in_range
    trow = shadow_maps[..., 1:5].reshape(-1, 4)[flat_t]
    tint_lo = jnp.where(((z_t < trow[..., 3]) & ok_t)[..., None],
                        trow[..., 0:3], 1.0)
    if tsub > 1:
        tint = jnp.repeat(jnp.repeat(tint_lo, tsub, axis=0), tsub, axis=1)
        tint = tint[:lit.shape[0], :lit.shape[1]]
    else:
        tint = tint_lo

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
    lit = lit[..., None] * tint               # (h, w, 3)
    if step > 1:
        # depth-guided upsample: crisp shadow silhouettes at depth edges
        lit = bilateral_upsample_to(lit, view_depth, view_depth_full,
                                    full_shape[0], full_shape[1])
    return lit
