"""Weighted-blended order-independent transparency.

Rebuild of OitRenderSystem (include/garden/system/render/oit.hpp:38,
shaders/oit.frag — McGuire/Bavoil weighted-blended OIT): translucent
geometry rasterizes into an accumulation buffer (premultiplied color *
depth-weight) and a reveal buffer (product of 1-alpha); a fullscreen
composite blends over the opaque HDR. No sorting needed — the weight
function handles ordering approximately, which is why the reference pairs
it with back-to-front sorted translucency only for refractive cases.

The Pallas kernel mirrors the visibility raster but accumulates instead of
depth-testing (translucents never write depth, they test against the opaque
depth buffer).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garden_tpu.render import raster

Array = jnp.ndarray


def _oit_kernel(count_ref, data_ref, opaque_depth_ref,
                acc_r_ref, acc_g_ref, acc_b_ref, acc_w_ref, reveal_ref,
                *, tile: int, tiles_x: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_idx = ty * tiles_x + tx
    # tpu.iota must be integer-typed; cast after
    ix = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1).astype(jnp.float32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0).astype(jnp.float32)
    px = (tx * tile + 0.5) + ix
    py = (ty * tile + 0.5) + iy

    acc_r_ref[:] = jnp.zeros((tile, tile), jnp.float32)
    acc_g_ref[:] = jnp.zeros((tile, tile), jnp.float32)
    acc_b_ref[:] = jnp.zeros((tile, tile), jnp.float32)
    acc_w_ref[:] = jnp.zeros((tile, tile), jnp.float32)
    reveal_ref[:] = jnp.ones((tile, tile), jnp.float32)

    def body(c, _):
        d = data_ref[0, c]  # (16,)
        x0, y0, x1, y1, x2, y2 = d[0], d[1], d[2], d[3], d[4], d[5]
        z0, z1, z2, inv_area = d[6], d[7], d[8], d[9]
        cr, cg, cb, alpha = d[10], d[11], d[12], d[13]
        e0 = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
        e1 = (px - x2) * (y0 - y2) - (py - y2) * (x0 - x2)
        e2 = (px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        b2 = e2 * inv_area
        z = b0 * z0 + b1 * z1 + b2 * z2
        # visible if in front of the opaque surface (reverse-Z)
        vis = inside & (z >= opaque_depth_ref[:]) & (z <= 1.0)
        # McGuire depth weight (oit.frag): nearer (larger reverse-Z) heavier
        wgt = jnp.clip(z * z * 10.0 + 0.01, 0.01, 30.0) * alpha
        wv = jnp.where(vis, wgt, 0.0)
        acc_r_ref[:] = acc_r_ref[:] + cr * wv
        acc_g_ref[:] = acc_g_ref[:] + cg * wv
        acc_b_ref[:] = acc_b_ref[:] + cb * wv
        acc_w_ref[:] = acc_w_ref[:] + wv
        reveal_ref[:] = reveal_ref[:] * jnp.where(vis, 1.0 - alpha, 1.0)
        return 0

    jax.lax.fori_loop(0, count_ref[tile_idx, 0], body, 0)


def rasterize_oit(
    setup: Dict[str, Array],
    tri_colors: Array,      # (T, 4) premultiplied-ready rgba per triangle
    tile_tris: Array,
    counts: Array,
    opaque_depth: Array,    # (H, W)
    width: int,
    height: int,
    tile: int,
) -> Tuple[Array, Array]:
    """Returns (accum (H, W, 4), reveal (H, W))."""
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    n_tiles = tiles_x * tiles_y
    c = tile_tris.shape[1]

    # pack records densely FIRST, fetch with one row gather (field-wise
    # gathers and per-column slices both cost ~10x more on TPU)
    t_count = setup["valid"].shape[0]
    sx, sy, z = setup["sx"], setup["sy"], setup["z"]    # (3, T) corner-major
    xy = jnp.stack([sx[0], sy[0], sx[1], sy[1], sx[2], sy[2]], axis=-1)
    records = jnp.concatenate(
        [xy, jnp.stack([z[0], z[1], z[2]], axis=-1),
         setup["inv_area"][:, None], tri_colors,
         jnp.zeros((t_count, 2), jnp.float32)],
        axis=-1,
    )  # (T, 16)
    # all-zero sentinel row for empty (-1) slots: alpha 0 accumulates
    # nothing (mapping holes to record 0 double-counted triangle 0)
    records = jnp.concatenate(
        [records, jnp.zeros((1, 16), jnp.float32)], axis=0)
    data = records[jnp.where(tile_tris >= 0, tile_tris, t_count)]

    h_pad = tiles_y * tile
    w_pad = tiles_x * tile
    pad_depth = jnp.pad(opaque_depth,
                        ((0, h_pad - height), (0, w_pad - width)),
                        constant_values=2.0)
    counts2d = counts.reshape(n_tiles, 1)
    out_block = pl.BlockSpec((tile, tile), lambda ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_oit_kernel, tile=tile, tiles_x=tiles_x),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((n_tiles, 1), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 16), lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            out_block,
        ],
        out_specs=(out_block,) * 5,
        out_shape=tuple(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32) for _ in range(5)
        ),
        interpret=raster._interpret(),
    )(counts2d, data, pad_depth)

    acc_r, acc_g, acc_b, acc_w, reveal = outs
    accum = jnp.stack([acc_r, acc_g, acc_b, acc_w], axis=-1)
    return accum[:height, :width], reveal[:height, :width]


def composite(hdr_opaque: Array, accum: Array, reveal: Array) -> Array:
    """Fullscreen OIT composite (oit.frag analog)."""
    avg_color = accum[..., :3] / jnp.maximum(accum[..., 3:4], 1e-5)
    any_frag = accum[..., 3] > 0.0
    out = avg_color * (1.0 - reveal[..., None]) + hdr_opaque * reveal[..., None]
    return jnp.where(any_frag[..., None], out, hdr_opaque)
