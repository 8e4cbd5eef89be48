"""Software rasterization: triangle setup, tile binning, Pallas raster kernel.

The TPU replacement for the reference's hardware raster draw path
(MeshRenderSystem's DrawIndexed commands into the G-buffer render pass,
mesh.cpp:556-719 + VulkanCommandBuffer replay). Architecture (CuRast-style
tiled software raster, see PAPERS.md):

1. `setup_triangles` (XLA): clip-space verts -> screen coords, reverse-Z
   depths, 1/w for perspective-correct interpolation, backface/near culls.
2. `bin_triangles` (XLA): each triangle emits (tile, tri) pairs for its
   screen-tile footprint (up to FOOT x FOOT tiles); one global sort by tile
   key; per-tile contiguous ranges found by searchsorted. Triangles with a
   bigger footprint go to a small 'big list' SHARED by every tile (one
   extra kernel block, drawn first) — fixed capacities everywhere,
   overflow drops triangles (back-to-front artifacts only, never OOM).
3. `rasterize_visibility` (Pallas, grid = screen tiles): each tile loops its
   binned triangles (dynamic trip count), evaluates edge functions over the
   whole tile vectorized on the VPU, and keeps the nearest hit per pixel:
   a visibility buffer of (tri id, barycentrics, depth). Shading is
   deferred to a separate gather pass (render/gbuffer.py) so raster work is
   independent of material cost.

The visibility buffer replaces the reference's G-buffer *raster* stage; the
G-buffer itself is reconstructed in gbuffer.py. Depth-only rasterization for
shadow maps reuses the same kernel with a trivial output spec.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garden_tpu.core import math3d as m3
from garden_tpu.ops.segments import run_edges as _run_edges

Array = jnp.ndarray

FOOT = 4  # max tile footprint edge for per-tile binning (else 'big list')
NEAR_EPS = 1e-6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def tpu_tile_legal(tile: int, width: int, height: int,
                   tile_h: int = None) -> bool:
    """Whether a raster tile layout lowers on TPU: a non-full output block's
    last dim must be a multiple of 128 lanes and its second-minor dim a
    multiple of 8 sublanes (the constraint that broke round-1's entry():
    tile_size=32 at 128px width fails Pallas lowering).

    RECTANGULAR tiles: tile is the width (>= 128 lanes), tile_h the height.
    Small triangles waste VPU lanes quadratically with tile area — a ~20px
    caster covers <3% of a 128x128 tile's 16384 lanes but ~20% of a
    (16, 128) tile's 2048 — so short-wide tiles are the natural TPU shape
    (measured: CSM cascade kernel 8.6 -> ~2.5 ms on the dense pile)."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    return tiles_x * tiles_y <= 1 or (tile % 128 == 0 and th % 8 == 0)


def setup_triangles(
    clip: Array,          # (V, 4) clip-space positions
    indices: Array,       # (T, 3)
    tri_valid: Array,     # (T,)
    width: int,
    height: int,
) -> Dict[str, Array]:
    """Screen-space triangle setup from a vertex pool (one (T,3) gather)."""
    return setup_triangles_tv(clip[indices], tri_valid, width, height)


def setup_triangles_tv(
    v: Array,             # (T, 3, 4) clip-space triangle vertices
    tri_valid: Array,     # (T,)
    width: int,
    height: int,
) -> Dict[str, Array]:
    """Screen-space triangle setup from pre-gathered triangle vertices.

    Multi-pass renderers (main + shadow cascades) should gather world-space
    triangle vertices ONCE and transform per pass — each per-pass
    clip[indices] gather costs ~1.5ms at 123K triangles on TPU. Prefer
    setup_triangles_planes for corner-major clip components."""
    comps = tuple(jnp.transpose(v[..., i]) for i in range(4))   # (3, T) x4
    return setup_triangles_planes(*comps, tri_valid, width, height)


def setup_triangles_planes(
    cx: Array,            # (3, T) clip x per corner (corner-major)
    cy: Array,
    cz: Array,
    cw: Array,
    tri_valid: Array,     # (T,)
    width: int,
    height: int,
) -> Dict[str, Array]:
    """Screen-space setup from PER-COMPONENT clip planes.

    The 2-D per-corner fields (sx/sy/z/inv_w) keep T in the 128-lane
    MINOR dim: the (T, 3)-oriented formulation this replaces put the
    3-corner axis minor, which tiles to 128 lanes (42x padding) on every
    elementwise op — the round-4 trace charged ~3 ms/frame of xform/setup
    fma time to exactly that (ARCHITECTURE.md round-5 notes)."""
    # conservative near clip: reject triangles with any vertex behind the
    # near plane (finely tessellated scenes make this loss negligible)
    in_front = jnp.all(cw > NEAR_EPS, axis=0)
    w_safe = jnp.maximum(cw, NEAR_EPS)
    inv_w = 1.0 / w_safe                  # (3, T)
    sx = (cx * inv_w * 0.5 + 0.5) * width
    sy = (0.5 - cy * inv_w * 0.5) * height   # y-down screen
    z = cz * inv_w                        # reverse-Z in [0, 1]

    # signed area in screen space; CCW meshes become CW after the y-flip,
    # so front faces have negative area here. Cull area >= 0 (backfaces).
    ax = sx[1] - sx[0]
    ay = sy[1] - sy[0]
    bx = sx[2] - sx[0]
    by = sy[2] - sy[0]
    area = ax * by - ay * bx
    front = area < -1e-8

    xmin = jnp.min(sx, axis=0)
    xmax = jnp.max(sx, axis=0)
    ymin = jnp.min(sy, axis=0)
    ymax = jnp.max(sy, axis=0)
    on_screen = (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)

    valid = tri_valid & in_front & front & on_screen
    # edges e_i sum to -area (positive for front faces); bary_i = e_i/(-area)
    return {
        "sx": sx, "sy": sy, "z": z, "inv_w": inv_w,   # (3, T) corner-major
        "inv_area": jnp.where(valid, 1.0 / jnp.where(front, -area, 1.0), 0.0),
        "xmin": xmin, "xmax": xmax, "ymin": ymin, "ymax": ymax,
        "valid": valid,
    }


def bin_triangles(
    setup: Dict[str, Array],
    width: int,
    height: int,
    tile: int,
    max_per_tile: int,
    max_big: int = 64,
    priority: Array = None,
    bucket_priority: Array = None,
    foot: int = None,
    tile_h: int = None,
    foot_y: int = None,
    max_active: int = None,
) -> Tuple[Array, ...]:
    """Returns (tile_tris (tiles, max_per_tile) int32 padded with -1,
    counts (tiles,) int32, big_list (max_big,) int32 padded with -1).
    tiles = tiles_y * tiles_x, row-major.

    Triangles whose tile footprint exceeds foot x foot_y go to the SHARED
    big list, which raster kernels receive as one (B, 16) block per grid
    point instead of a per-tile prefix: broadcasting B big slots into every
    tile's record fetch doubled the (tiles, C, 16) gather on mostly-empty
    targets like the cascade atlas (measured ~2.3 ms/frame at 4K tiles).
    Kernels draw the big block FIRST, so bin order = big, then grid.

    priority: optional int32[T] ordering key — entries within a tile come
    out sorted by ascending priority instead of triangle id (the
    back-to-front translucent sort, mesh.hpp:204; priorities must be a
    permutation of [0, T)). The big list stays in id order.

    bucket_priority: optional int32[T] COARSE ordering key in [0, 16):
    rides as 4 extra bits inside the packed binning sort, so tile entries
    come out bucket-ordered with NO argsort, NO inverse-permutation
    scatter and NO per-tile remap gather (the exact `priority` path costs
    all three, ~2 ms at 123K triangles). Right for order-as-a-HEURISTIC
    uses — the opaque front-to-back overflow-drop policy — not for
    correctness-ordered blending. Mutually exclusive with `priority`.

    tile_h: rectangular tiles (tile wide, tile_h tall; see tpu_tile_legal).
    foot_y: y-footprint for short tiles (defaults to foot scaled so the
    covered pixel span matches the x span).

    max_active: COMPACTED output for sparse targets — returns a 4-tuple
    (tile_tris (A, C), counts (A,), big_list, act_ids (A,)) holding only
    the A most-populated tiles' lists (A = max_active), so the per-tile
    list fetch scales with occupancy instead of tile count. Consume with
    rasterize_depth(act_ids=...). Incompatible with `priority` (the
    inverse-permutation remap assumes dense rows)."""
    FOOT = foot if foot is not None else globals()["FOOT"]
    th = tile_h or tile
    FOOT_Y = foot_y if foot_y is not None else FOOT
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    t = setup["valid"].shape[0]

    tx0 = jnp.clip(jnp.floor(setup["xmin"] / tile).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(setup["xmax"] / tile).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(setup["ymin"] / th).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(setup["ymax"] / th).astype(jnp.int32), 0, tiles_y - 1)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    small = setup["valid"] & (nx <= FOOT) & (ny <= FOOT_Y)
    big = setup["valid"] & ~small

    # (tri, k) pair emission for small triangles
    # pair emission in (K, T) orientation: T in the MINOR dim keeps every
    # emission op lane-dense (the (T, K) layout puts K=4 in the 128-lane
    # minor dim — measured ~1 ms of padded-fusion traffic at 3x123K
    # cascade triangles). Pair order changes, the sort canonicalizes it.
    k = jnp.arange(FOOT * FOOT_Y, dtype=jnp.int32)
    kx = k % FOOT
    ky = k // FOOT
    ptx = tx0[None, :] + kx[:, None]
    pty = ty0[None, :] + ky[:, None]
    pair_ok = (small[None, :] & (kx[:, None] < nx[None, :])
               & (ky[:, None] < ny[None, :]))
    # THREE key classes: tile keys, then a reserved BIG key (n_tiles) for
    # every slot of a big triangle, then the sentinel (n_tiles + 1). Big
    # triangles ride the SAME sort as a contiguous run of K identical
    # copies each — the big list falls out of the run by striding, killing
    # the separate (T,)-wide top_k selection (~0.4 ms on the cascade pass)
    key = jnp.where(pair_ok, pty * tiles_x + ptx,
                    jnp.where(big[None, :], n_tiles, n_tiles + 1))
    key = key.reshape(-1)
    tri_of_pair = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[None, :], (FOOT * FOOT_Y, t)
    ).reshape(-1)

    # ONE single-operand sort of (key << bits | payload): applying an
    # argsort permutation is two 2M-element random gathers (~60ms at 123K
    # tris on TPU, the round-1 frame's hottest single cost); the packed sort
    # gets key and payload ordered together for the sort's own ~4ms
    if priority is None:
        payload = tri_of_pair
    else:  # emission is per-triangle-row: broadcast, don't gather
        payload = jnp.broadcast_to(
            priority[None, :], (FOOT * FOOT_Y, t)).reshape(-1)
    tri_bits = max(int(np.ceil(np.log2(max(t, 2)))), 1)
    bkt_bits = 0
    if bucket_priority is not None:
        assert priority is None, "priority and bucket_priority are exclusive"
        bkt_bits = 4
        # coarse order rides between tile key and triangle id
        key = (key << bkt_bits) | jnp.broadcast_to(
            jnp.clip(bucket_priority, 0, 15)[None, :],
            (FOOT * FOOT_Y, t)).reshape(-1)
    key_bits = max(int(np.ceil(np.log2(n_tiles + 3))), 1) + bkt_bits
    if tri_bits + key_bits <= 31:
        packed = jnp.sort((key << tri_bits) | payload)
        key_sorted = packed >> (tri_bits + bkt_bits)
        pay_sorted = packed & ((1 << tri_bits) - 1)
    else:  # huge scenes: variadic sort (no permutation gathers either);
        # payload is a SECONDARY key so equal-key runs come out
        # payload-ordered — the big-run striding below requires each big
        # triangle's K copies consecutive (the packed path has this by
        # construction)
        key_sorted, pay_sorted = jax.lax.sort(
            (key, payload), num_keys=2)
        key_sorted = key_sorted >> bkt_bits

    # start/end of each tile's contiguous run: keys are integers and the
    # queries are consecutive, so side-right(i) == side-left(i+1) — ONE
    # edge table of n_tiles+1 probes replaces the left+right pair, built
    # by _run_edges' dense two-level count (jnp.searchsorted lowers to a
    # while-loop binary search whose ~21 iterations are each a separate
    # serial dispatch: 0.92 ms/frame on the cascade atlas in the round-5
    # trace; the dense count is 4 fused ops)
    edges = _run_edges(key_sorted, n_tiles + 2)
    start = edges[:n_tiles]
    end = edges[1:n_tiles + 1]
    big_run = (edges[n_tiles], edges[n_tiles + 1])
    if max_active is not None:
        # compact BEFORE the list gather: only the A most-populated tiles'
        # runs are fetched from the sorted pair array. Selection via ONE
        # packed descending sort of (count | tile) — lax.top_k over the
        # tile axis measured ~0.2 ms slower at 3K tiles
        assert priority is None, "max_active and priority are exclusive"
        a = min(max_active, n_tiles)
        bits_t = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
        cnt_c = jnp.minimum(end - start, (1 << (30 - bits_t)) - 1)
        packed_a = jnp.sort(
            (cnt_c << bits_t) | jnp.arange(n_tiles, dtype=jnp.int32))
        act_ids = (packed_a[::-1][:a] & ((1 << bits_t) - 1)).astype(jnp.int32)
        start = start[act_ids]
        end = end[act_ids]
    take = jnp.arange(max_per_tile, dtype=jnp.int32)
    gather = start[:, None] + take[None, :]
    ok = gather < end[:, None]
    gather = jnp.clip(gather, 0, key.shape[0] - 1)
    # NOTE: a vmapped dynamic_slice (one C-lane slice per tile) was tried
    # here and lowered to ~510 separate 1 us gathers — slower than this
    # single element gather (round-5 trace)
    tile_pay = pay_sorted[gather]                      # (tiles, C) small gather
    if priority is not None:
        # invert the priority permutation at tile-list granularity only
        inv = jnp.zeros((t,), jnp.int32).at[priority].set(
            jnp.arange(t, dtype=jnp.int32))
        tile_pay = inv[jnp.clip(tile_pay, 0, t - 1)]
    tile_tris = jnp.where(ok, tile_pay, -1)            # (tiles, C)
    counts = jnp.minimum(end - start, max_per_tile).astype(jnp.int32)

    # big triangles: fixed global list, shared across tiles — extracted
    # from the reserved-key run of the SAME sort. Each big triangle holds
    # K identical consecutive copies there (same packed key|payload), so
    # striding by K yields each once, ascending (id order with no
    # priority; back-to-front under `priority`, which is MORE correct for
    # the ordered-blend consumers than the old id-ordered top_k list)
    max_big = min(max_big, t)
    kk = FOOT * FOOT_Y
    big_cnt = (big_run[1] - big_run[0]) // kk
    pos = big_run[0] + jnp.arange(max_big, dtype=jnp.int32) * kk
    big_pay = pay_sorted[jnp.clip(pos, 0, key.shape[0] - 1)]
    if priority is not None:
        big_pay = inv[jnp.clip(big_pay, 0, t - 1)]
    big_list = jnp.where(jnp.arange(max_big) < big_cnt,
                         big_pay.astype(jnp.int32), -1)      # (B,)
    if max_active is not None:
        return tile_tris, counts, big_list, act_ids
    return tile_tris, counts, big_list


def bin_triangles_corner(
    setup: Dict[str, Array],
    width: int,
    height: int,
    tile: int,
    max_per_tile: int,
    max_big: int = 64,
    tile_h: int = None,
    max_active: int = None,
) -> Tuple[Array, ...]:
    """bin_triangles for ORDER-FREE consumers (depth-only raster), at a
    quarter of the sort cost: each small triangle is sorted ONCE by its
    TOP-LEFT tile instead of emitting foot*foot_y=4 slot copies, and each
    tile assembles its list from the 4 runs that can reach it (own,
    left, up, up-left) with dense run arithmetic + one payload gather.

    The footprint constraint is fixed at 2x2 tiles (the foot=2/foot_y=2
    configuration every cascade pass uses); larger triangles ride the
    shared big list exactly as in bin_triangles. Entries come out in
    (run, id) order — NOT globally id-sorted — which is only legal for
    consumers that reduce per pixel order-independently (rasterize_depth's
    max). The cascade-atlas binning sort was 2.2 ms/frame at 1.48M slot
    copies (round-5 trace); this sorts 370K.

    Returns the same tuple shapes as bin_triangles (incl. the
    max_active compacted form)."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    t = setup["valid"].shape[0]

    tx0 = jnp.clip(jnp.floor(setup["xmin"] / tile).astype(jnp.int32),
                   0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(setup["xmax"] / tile).astype(jnp.int32),
                   0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(setup["ymin"] / th).astype(jnp.int32),
                   0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(setup["ymax"] / th).astype(jnp.int32),
                   0, tiles_y - 1)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    small = setup["valid"] & (nx <= 2) & (ny <= 2)
    big = setup["valid"] & ~small

    key = jnp.where(small, ty0 * tiles_x + tx0,
                    jnp.where(big, n_tiles, n_tiles + 1))
    tri_bits = max(int(np.ceil(np.log2(max(t, 2)))), 1)
    key_bits = max(int(np.ceil(np.log2(n_tiles + 3))), 1)
    ids = jnp.arange(t, dtype=jnp.int32)
    if tri_bits + key_bits <= 31:
        packed = jnp.sort((key << tri_bits) | ids)
        key_sorted = packed >> tri_bits
        pay_sorted = packed & ((1 << tri_bits) - 1)
    else:
        key_sorted, pay_sorted = jax.lax.sort((key, ids), num_keys=2)

    edges = _run_edges(key_sorted, n_tiles + 2)
    start = edges[:n_tiles]
    length = edges[1:n_tiles + 1] - start
    big_run = (edges[n_tiles], edges[n_tiles + 1])

    # the 4 runs that can contribute to tile k: own (k), left (k-1, only
    # when the tile is not in column 0), up (k-tiles_x), up-left; border
    # runs are masked to zero length instead of wrapping
    col0 = (jnp.arange(n_tiles, dtype=jnp.int32) % tiles_x) == 0
    row0 = jnp.arange(n_tiles, dtype=jnp.int32) < tiles_x

    def run(shift, dead):
        s = jnp.roll(start, shift)
        l = jnp.where(dead, 0, jnp.roll(length, shift))
        return s, l

    s0, l0 = start, length
    s1, l1 = run(1, col0)
    s2, l2 = run(tiles_x, row0)
    s3, l3 = run(tiles_x + 1, row0 | col0)

    if max_active is not None:
        # activity by candidate upper bound (coverage filtering happens
        # after the fetch; an overestimate only costs a wasted slot row)
        a = min(max_active, n_tiles)
        cnt_ub = l0 + l1 + l2 + l3
        bits_t = max(int(np.ceil(np.log2(n_tiles + 1))), 1)
        cnt_c = jnp.minimum(cnt_ub, (1 << (30 - bits_t)) - 1)
        packed_a = jnp.sort(
            (cnt_c << bits_t) | jnp.arange(n_tiles, dtype=jnp.int32))
        act_ids = (packed_a[::-1][:a] & ((1 << bits_t) - 1)).astype(jnp.int32)
        pick = lambda x: x[act_ids]
        s0, l0, s1, l1 = pick(s0), pick(l0), pick(s1), pick(l1)
        s2, l2, s3, l3 = pick(s2), pick(l2), pick(s3), pick(l3)
        rows = a
    else:
        rows = n_tiles

    # slot j of a tile's list walks the concatenation of the 4 runs:
    # dense 4-way select of (source position, required-footprint bits)
    c1 = l0 + l1
    c2 = c1 + l2
    c3 = c2 + l3
    j = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]   # (1, C)
    in0 = j < l0[:, None]
    in1 = (j >= l0[:, None]) & (j < c1[:, None])
    in2 = (j >= c1[:, None]) & (j < c2[:, None])
    in3 = (j >= c2[:, None]) & (j < c3[:, None])
    src = jnp.where(
        in0, s0[:, None] + j,
        jnp.where(in1, s1[:, None] + (j - l0[:, None]),
                  jnp.where(in2, s2[:, None] + (j - c1[:, None]),
                            s3[:, None] + (j - c2[:, None]))))
    any_run = in0 | in1 | in2 | in3
    pay = pay_sorted[jnp.clip(src, 0, t - 1)]                # (rows, C)

    # coverage filter: an entry fetched from the left/up/up-left run only
    # covers this tile if its footprint extends right/down; footprint bits
    # ride a tiny (T,) side table fetched by the same indices
    fp = ((nx > 1).astype(jnp.int32)
          | ((ny > 1).astype(jnp.int32) << 1))               # (T,)
    fpe = fp[jnp.clip(pay, 0, t - 1)]                        # (rows, C)
    need = (jnp.where(in1 | in3, 1, 0) | jnp.where(in2 | in3, 2, 0))
    covered = any_run & ((fpe & need) == need)

    # compact the holes (order-free consumers): ascending sort pushes
    # dropped slots (sentinel INT_MAX) to the tail, then -1 them
    slot_val = jnp.where(covered, pay, jnp.int32(2147483647))
    slot_val = jnp.sort(slot_val, axis=1)
    tile_tris = jnp.where(slot_val == 2147483647, -1, slot_val)
    counts = jnp.sum(covered.astype(jnp.int32), axis=1)

    max_big = min(max_big, t)
    big_cnt = big_run[1] - big_run[0]
    pos = big_run[0] + jnp.arange(max_big, dtype=jnp.int32)
    big_pay = pay_sorted[jnp.clip(pos, 0, t - 1)]
    big_list = jnp.where(jnp.arange(max_big) < big_cnt,
                         big_pay.astype(jnp.int32), -1)
    if max_active is not None:
        return tile_tris, counts, big_list, act_ids
    return tile_tris, counts, big_list


def bin_big_supertiles(
    setup: Dict[str, Array],
    big_list: Array,        # (B,) triangle ids, -1 padded (bin_triangles)
    width: int,
    height: int,
    tile: int,
    tile_h: int,
    sup_x: int,
    sup_y: int,
    cap: int,
) -> Tuple[Array, Array, Tuple[int, int, int]]:
    """Per-SUPER-tile big lists: (sup_tris (n_sup, cap), sup_counts (n_sup,),
    (sup_x, sup_y, sups_x)).

    The shared global big list makes EVERY tile raster every big triangle —
    on the 3072-tile cascade atlas that was ~90% of the depth-kernel work
    (3072 x 64 (tri, tile) pairs for ~200 actually-covered pairs). Here the
    big candidates (already compacted to B entries by bin_triangles' top_k)
    are binned once more onto a coarse grid of sup_x x sup_y tiles
    (e.g. 512 x 128 px), with NO footprint limit: a big triangle emits a
    slot for every super-tile its bbox overlaps (B x n_sup is tiny — a few
    thousand pairs), so nothing ever falls back to a global list. Raster
    kernels then draw only their own super-tile's big block."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    sups_x = -(-tiles_x // sup_x)
    sups_y = -(-tiles_y // sup_y)
    n_sup = sups_x * sups_y
    spw = float(tile * sup_x)
    sph = float(th * sup_y)
    t = setup["valid"].shape[0]
    b = big_list.shape[0]

    safe = jnp.clip(big_list, 0, t - 1)
    ok = big_list >= 0
    x0 = setup["xmin"][safe]
    x1 = setup["xmax"][safe]
    y0 = setup["ymin"][safe]
    y1 = setup["ymax"][safe]
    s = jnp.arange(n_sup, dtype=jnp.int32)
    sx0 = ((s % sups_x).astype(jnp.float32)) * spw
    sy0 = ((s // sups_x).astype(jnp.float32)) * sph
    hit = (ok[:, None]
           & (x1[:, None] >= sx0[None, :]) & (x0[:, None] < sx0[None, :] + spw)
           & (y1[:, None] >= sy0[None, :]) & (y0[:, None] < sy0[None, :] + sph))
    key = jnp.where(hit, s[None, :], n_sup).reshape(-1)
    payload = jnp.broadcast_to(safe.astype(jnp.int32)[:, None],
                               (b, n_sup)).reshape(-1)
    tri_bits = max(int(np.ceil(np.log2(max(t, 2)))), 1)
    key_bits = max(int(np.ceil(np.log2(n_sup + 2))), 1)
    if tri_bits + key_bits <= 31:
        packed = jnp.sort((key << tri_bits) | payload)
        key_sorted = packed >> tri_bits
        pay_sorted = packed & ((1 << tri_bits) - 1)
    else:
        key_sorted, pay_sorted = jax.lax.sort((key, payload), num_keys=1)
    edges = _run_edges(key_sorted, n_sup + 1)
    start = edges[:-1]
    end = edges[1:]
    take = jnp.arange(cap, dtype=jnp.int32)
    gather = start[:, None] + take[None, :]
    in_range = gather < end[:, None]
    gather = jnp.clip(gather, 0, key.shape[0] - 1)
    sup_tris = jnp.where(in_range, pay_sorted[gather], -1)
    sup_counts = jnp.minimum(end - start, cap).astype(jnp.int32)
    return sup_tris, sup_counts, (sup_x, sup_y, sups_x)


def merge_big_list(tile_tris: Array, counts: Array,
                   big_list: Array) -> Tuple[Array, Array]:
    """Prepend the shared big list to every tile's row — the pre-split
    combined format, for consumers that loop one flat per-tile list (OIT).
    Returns (tile_tris (tiles, B + C), counts including the big prefix)."""
    n_tiles = tile_tris.shape[0]
    b = big_list.shape[0]
    big_tile = jnp.broadcast_to(big_list[None, :], (n_tiles, b))
    merged = jnp.concatenate([big_tile, tile_tris], axis=1)
    big_n = jnp.sum(big_list >= 0)
    merged_counts = jnp.where(counts > 0, b + counts, big_n).astype(jnp.int32)
    return merged, merged_counts




def _pack_edge_records(setup: Dict[str, Array],
                       tri_atlas: Array = None) -> Array:
    """(T + 1, 16) per-triangle records in edge-COEFFICIENT form:
    [a0 a1 a2 | b0 b1 b2 | c0 c1 c2 | S | z2 | dz0 | dz1 | inv_area |
     tri_id | atlas].

    e_k(px, py) = a_k*px + b_k*py + c_k, and e0+e1+e2 = S (= -area,
    positive for front faces), so the raster inner loop is 2 FMAs per edge
    plus one subtraction for e2 — about half the per-(triangle, pixel) VPU
    work of evaluating the three edge determinants from vertex positions
    (the raster kernels are VPU-compute-bound; measured ~2x on cascade-
    saturated tiles). Built with whole-(T,3) column math (rolls), since
    per-column slices of (T,3) arrays force layout copies on TPU.

    Row i carries its own id i in slot 14 (exact in f32 for ids < 2^24)
    and row T is a SENTINEL (id -1, inv_area 0): empty tile-list slots
    index the sentinel, so the per-tile fetch `records[safe]` needs no
    post-gather `.at[...].set` rewrite (a full-copy scatter that cost
    ~1.5 ms/frame on the cascade atlas).

    Inputs are corner-major (3, T) planes (setup_triangles_planes): the
    coefficient math runs lane-dense on T-minor rows; only the final
    record stack materializes the (T, 16) row layout the per-tile gather
    needs."""
    sx, sy, z = setup["sx"], setup["sy"], setup["z"]      # (3, T)
    a, b, c = [], [], []
    for k in range(3):
        x1, y1 = sx[(k + 1) % 3], sy[(k + 1) % 3]
        x2, y2 = sx[(k + 2) % 3], sy[(k + 2) % 3]
        a.append(y2 - y1)
        b.append(-(x2 - x1))
        c.append(y1 * (x2 - x1) - x1 * (y2 - y1))
    # S = e0 at v0 (e1, e2 vanish there)
    s_const = a[0] * sx[0] + b[0] * sy[0] + c[0]
    z2 = z[2]
    t_count = sx.shape[1]
    ids = jnp.arange(t_count, dtype=jnp.float32)
    atlas = (tri_atlas.astype(jnp.float32) if tri_atlas is not None
             else jnp.zeros((t_count,), jnp.float32))
    rec = jnp.stack(
        a + b + c + [s_const, z2, z[0] - z2, z[1] - z2,
                     setup["inv_area"], ids, atlas], axis=-1)   # (T, 16)
    sentinel = jnp.zeros((1, 16), jnp.float32).at[0, 14].set(-1.0)
    return jnp.concatenate([rec, sentinel], axis=0)       # (T + 1, 16)


def _safe_ids(tile_tris: Array, t_count: int) -> Array:
    """Map empty (-1) slots to the sentinel record row (index t_count)."""
    return jnp.where(tile_tris >= 0, tile_tris, t_count)


TRI_BLOCK = 16  # triangles per kernel iteration (sublane batch; 16 amortizes
# loop overhead further and still fits VMEM at 128px tiles)


def _raster_kernel(count_ref, bigcnt_ref, data_ref, big_ref, depth_ref,
                   id_ref, b0_ref, b1_ref,
                   *, tile: int, tiles_x: int, tile_h: int = None):
    """Visibility raster, TRI_BLOCK triangles per iteration.

    Pixels live flattened in the lane axis as (1, tile*tile); each iteration
    loads a (B, 16) record block, evaluates edge functions for all B
    triangles as (B, tile*tile) VPU ops, tournament-reduces them to the
    per-pixel nearest candidate, and merges once into the running buffers.
    Scalar loads and loop management amortize Bx vs the per-triangle loop
    (measured ~14x overhead in that form).

    Two loops: the SHARED big-triangle block (big_ref, same for every grid
    point — no per-tile gather) first, then the tile's own grid list."""
    th = tile_h or tile
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_idx = ty * tiles_x + tx
    n_px = th * tile
    # tpu.iota must be integer-typed; cast after
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col            # (1, n_px)
    py = (ty * th + 0.5) + row

    depth_ref[:] = jnp.zeros((th, tile), jnp.float32)
    id_ref[:] = jnp.full((th, tile), -1, jnp.int32)
    b0_ref[:] = jnp.zeros((th, tile), jnp.float32)
    b1_ref[:] = jnp.zeros((th, tile), jnp.float32)

    def process(d):
        # edge-coefficient records (_pack_edge_records): e = a*px + b*py + c
        e0 = d[:, 0:1] * px + d[:, 3:4] * py + d[:, 6:7]
        e1 = d[:, 1:2] * px + d[:, 4:5] * py + d[:, 7:8]
        e2 = d[:, 9:10] - e0 - e1            # e0+e1+e2 = S (= -area)
        inv_area = d[:, 13:14]
        tri_id = d[:, 14:15]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        z = d[:, 10:11] + b0 * d[:, 11:12] + b1 * d[:, 12:13]
        # padded/invalid slots hit the sentinel record: z == 0, tri_id < 0
        cand = inside & (z <= 1.0) & (z > 0.0) & (tri_id >= 0.0)
        zc = jnp.where(cand, z, 0.0)

        # tournament-reduce the B candidates to 1 per pixel
        def merge(za, ia, ba, bb, zb, ib, b2a, b2b):
            take_b = zb > za
            return (jnp.where(take_b, zb, za), jnp.where(take_b, ib, ia),
                    jnp.where(take_b, b2a, ba), jnp.where(take_b, b2b, bb))

        zs, ids, b0s, b1s = zc, jnp.broadcast_to(tri_id, zc.shape), b0, b1
        k = TRI_BLOCK
        while k > 1:
            h = k // 2
            zs_a, zs_b = zs[:h], zs[h:k]
            zs, ids, b0s, b1s = merge(
                zs_a, ids[:h], b0s[:h], b1s[:h],
                zs_b, ids[h:k], b0s[h:k], b1s[h:k])
            k = h

        z_new = zs.reshape(th, tile)
        keep = z_new > depth_ref[:]
        depth_ref[:] = jnp.where(keep, z_new, depth_ref[:])
        id_ref[:] = jnp.where(keep, ids.reshape(th, tile).astype(jnp.int32),
                              id_ref[:])
        b0_ref[:] = jnp.where(keep, b0s.reshape(th, tile), b0_ref[:])
        b1_ref[:] = jnp.where(keep, b1s.reshape(th, tile), b1_ref[:])

    def body_big(cb, _):
        process(big_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    def body(cb, _):
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    nb_big = (bigcnt_ref[0, 0] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, nb_big, body_big, 0)
    n_blocks = (count_ref[0, tile_idx] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, n_blocks, body, 0)


def _big_inputs(records: Array, big_list: Array) -> Tuple[Array, Array]:
    """(big_data (B_pad, 16), bigcnt (1, 1)) kernel inputs from the shared
    big list; B pads to a TRI_BLOCK multiple, holes hit the sentinel row."""
    t_count = records.shape[0] - 1
    b = big_list.shape[0]
    if b % TRI_BLOCK:
        big_list = jnp.pad(big_list, (0, TRI_BLOCK - b % TRI_BLOCK),
                           constant_values=-1)
    big_data = records[_safe_ids(big_list, t_count)]        # (B_pad, 16)
    bigcnt = jnp.sum(big_list >= 0).reshape(1, 1).astype(jnp.int32)
    # (1, B, 16): mirrors the per-tile data block's proven TPU layout
    # (2D blocks with a 16-lane minor dim are not a shape the Mosaic
    # lowering has been exercised with here)
    return big_data[None], bigcnt


def rasterize_visibility(
    setup: Dict[str, Array],
    tile_tris: Array,   # (tiles, C)
    counts: Array,      # (tiles,)
    big_list: Array,    # (B,) shared big-triangle list
    width: int,
    height: int,
    tile: int,
    tile_h: int = None,
) -> Dict[str, Array]:
    """Visibility buffer: depth (H,W) reverse-Z, tri id (H,W), screen
    barycentrics b0/b1 (H,W)."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    if not _interpret() and not tpu_tile_legal(tile, width, height, th):
        # Catch the illegal layout at trace time with a clear message
        # instead of an XLA lowering error (shipped as a round-1 bug:
        # entry() at tile_size=32 failed to lower on hardware).
        raise ValueError(
            f"rasterize_visibility: tile={tile}x{th} is not TPU-legal for a "
            f"{height}x{width} frame ({tiles_y}x{tiles_x} tiles). Use "
            f"tile_size=128 (or a single tile covering the whole frame)."
        )
    if tile_tris.shape[1] % TRI_BLOCK:
        pad = TRI_BLOCK - tile_tris.shape[1] % TRI_BLOCK
        tile_tris = jnp.pad(tile_tris, ((0, 0), (0, pad)), constant_values=-1)
    c = tile_tris.shape[1]

    # per-tile gathered triangle data (tiles, C, 16): 16-float edge records
    # (_pack_edge_records) with the triangle id riding in the float record
    # (exact for ids < 2^24) so the kernel needs no second indexed input.
    # Records are packed densely FIRST so the per-tile fetch is ONE
    # contiguous row gather (11 separate field gathers cost ~10x more: TPU
    # random gathers pay per element, not per byte); empty slots hit the
    # sentinel row, so no post-gather rewrite is needed.
    records = _pack_edge_records(setup)                     # (T + 1, 16)
    t_count = records.shape[0] - 1
    data = records[_safe_ids(tile_tris, t_count)]           # (tiles, C, 16)
    big_data, bigcnt = _big_inputs(records, big_list)

    grid = (tiles_y, tiles_x)
    out_block = pl.BlockSpec((th, tile), lambda ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM)
    h_pad = tiles_y * th
    w_pad = tiles_x * tile
    # counts ride in SMEM as ONE full-array block (TPU blocks must be
    # 8/128-aligned or whole-array); the kernel indexes by tile id.
    # Layout (1, n_tiles): lane padding lands on the long axis — the
    # (n_tiles, 1) orientation pads every row to 128 lanes and overflows
    # SMEM past ~2K tiles (hit by short-wide tiles on the cascade atlas)
    counts2d = counts.reshape(1, n_tiles)

    depth, tri_id, b0, b1 = pl.pallas_call(
        functools.partial(_raster_kernel, tile=tile, tiles_x=tiles_x,
                          tile_h=th),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tiles), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 16), lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_data.shape[1], 16),
                         lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_block, out_block, out_block, out_block),
        out_shape=(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        ),
        interpret=_interpret(),
    )(counts2d, bigcnt, data, big_data)

    return {
        "depth": depth[:height, :width],
        "tri_id": tri_id[:height, :width],
        "b0": b0[:height, :width],
        "b1": b1[:height, :width],
    }




GBUF_CH = 24  # in-kernel G-buffer plane count (see _raster_shade_kernel)


def _raster_shade_kernel(count_ref, data_ref, shade_ref, depth_ref, id_ref,
                         b0_ref, b1_ref, attrs_ref, depth_s, id_s, b0_s,
                         b1_s, slot_s,
                         *, tile: int, tiles_x: int, rec: int, chunk: int,
                         tile_h: int = None, gbuf: bool = False):
    """Visibility raster + in-VMEM record shading.

    Phase 1 (VPU): the tournament raster loop of `_raster_kernel`, extended
    to track each pixel's winning slot in the tile's COMBINED list (big
    prefix + grid entries — the caller folds the shared big list into each
    tile's block, see rasterize_visibility_shaded). All running state lives
    in FLAT (1, n_px) f32 scratch: Mosaic cannot reshape i1/i32 vectors
    between (tile, tile) and (1, n_px), so the loop never leaves the flat
    layout; outputs reshape f32 once at the end.

    Phase 2 (MXU): per-pixel shading attributes materialize as ONE one-hot
    contraction attrs[:, px] = recs @ onehot(slot[px]) while the combined
    record block is still in VMEM. This replaces the per-pixel row gather
    of the (T, rec) record table from HBM — the single most expensive op
    of the round-2 frame (~2M random rows, ~14 ms at 1080p). Folding big
    into the same contraction (instead of a second 128-slot-padded big
    dot for ~33 real entries) halved phase 2's MXU work — the phase was
    ~90% of the 3.6 ms kernel at 510 tiles x 2 chunks x 2 dots. The
    one-hot is built in chunks of `chunk` pixels to bound VMEM.
    """
    th = tile_h or tile
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_idx = ty * tiles_x + tx
    n_px = th * tile
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col            # (1, n_px)
    py = (ty * th + 0.5) + row

    depth_s[:] = jnp.zeros((1, n_px), jnp.float32)
    id_s[:] = jnp.full((1, n_px), -1.0, jnp.float32)
    b0_s[:] = jnp.zeros((1, n_px), jnp.float32)
    b1_s[:] = jnp.zeros((1, n_px), jnp.float32)
    slot_s[:] = jnp.full((1, n_px), -1.0, jnp.float32)

    def process(d, slot0):
        # edge-coefficient records (_pack_edge_records): e = a*px + b*py + c
        e0 = d[:, 0:1] * px + d[:, 3:4] * py + d[:, 6:7]
        e1 = d[:, 1:2] * px + d[:, 4:5] * py + d[:, 7:8]
        e2 = d[:, 9:10] - e0 - e1            # e0+e1+e2 = S (= -area)
        inv_area = d[:, 13:14]
        tri_id = d[:, 14:15]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        b0 = e0 * inv_area
        b1 = e1 * inv_area
        z = d[:, 10:11] + b0 * d[:, 11:12] + b1 * d[:, 12:13]
        cand = inside & (z <= 1.0) & (z > 0.0) & (tri_id >= 0.0)
        zc = jnp.where(cand, z, 0.0)

        def merge(za, ia, ba, bb, sa, zb, ib, b2a, b2b, sb):
            take_b = zb > za
            return (jnp.where(take_b, zb, za), jnp.where(take_b, ib, ia),
                    jnp.where(take_b, b2a, ba), jnp.where(take_b, b2b, bb),
                    jnp.where(take_b, sb, sa))

        zs = zc
        ids = jnp.broadcast_to(tri_id, zc.shape)
        b0s, b1s = b0, b1
        slots = jnp.broadcast_to(slot0, zc.shape)
        k = TRI_BLOCK
        while k > 1:
            h = k // 2
            zs, ids, b0s, b1s, slots = merge(
                zs[:h], ids[:h], b0s[:h], b1s[:h], slots[:h],
                zs[h:k], ids[h:k], b0s[h:k], b1s[h:k], slots[h:k])
            k = h

        keep = zs > depth_s[:]               # (1, n_px), flat throughout
        depth_s[:] = jnp.where(keep, zs, depth_s[:])
        id_s[:] = jnp.where(keep, ids, id_s[:])
        b0_s[:] = jnp.where(keep, b0s, b0_s[:])
        b1_s[:] = jnp.where(keep, b1s, b1_s[:])
        slot_s[:] = jnp.where(keep, slots, slot_s[:])

    def slot_iota(cb, base):
        return (base + cb * TRI_BLOCK + jax.lax.broadcasted_iota(
            jnp.int32, (TRI_BLOCK, 1), 0)).astype(jnp.float32)

    def body(cb, _):
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :],
                slot_iota(cb, 0))
        return 0

    n_blocks = (count_ref[0, tile_idx] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, n_blocks, body, 0)

    depth_ref[:] = depth_s[:].reshape(th, tile)
    id_ref[:] = id_s[:].reshape(th, tile).astype(jnp.int32)
    b0_ref[:] = b0_s[:].reshape(th, tile)
    b1_ref[:] = b1_s[:].reshape(th, tile)

    # phase 2: records -> per-pixel attrs by ONE one-hot matmul, chunked
    c = shade_ref.shape[2]
    rows_per_chunk = chunk // tile
    recs = shade_ref[0]                               # (rec, C)
    for ch in range(n_px // chunk):
        sl = slot_s[0:1, pl.ds(ch * chunk, chunk)]    # (1, chunk) f32
        iota_c = jax.lax.broadcasted_iota(
            jnp.int32, (c, chunk), 0).astype(jnp.float32)
        onehot = (iota_c == sl).astype(jnp.float32)   # (C, chunk)
        part = jnp.dot(recs, onehot,
                       preferred_element_type=jnp.float32)  # (rec, chunk)
        if not gbuf:
            attrs_ref[:, pl.ds(ch * rows_per_chunk, rows_per_chunk), :] = \
                part.reshape(rec, rows_per_chunk, tile)
            continue
        # phase 3 (gbuf mode): finish the G-buffer IN-KERNEL while the
        # record chunk is in registers. Materializing the raw 40-channel
        # attrs at 1080p wrote a 334 MB f32 buffer that every downstream
        # fusion re-read (>1.3 GB HBM traffic + a 1.2 ms layout-convert
        # copy, round-5 HLO/trace). The interpolation needs only b0/b1
        # (scratch) and the pixel coords (iota), so the raw record never
        # leaves VMEM; the output is GBUF_CH finished planes:
        #   [0:3 normal | 3:5 uv | 5:14 material (base3, metallic,
        #    roughness, emissive3, reflectance) | 14 tex | 15 instance |
        #    16:18 velocity | 18:24 pad]
        # Record layout: gbuffer.pack_triangle_records.
        b0c = b0_s[0:1, pl.ds(ch * chunk, chunk)]     # (1, chunk)
        b1c = b1_s[0:1, pl.ds(ch * chunk, chunk)]
        b2c = 1.0 - b0c - b1c
        vis_m = id_s[0:1, pl.ds(ch * chunk, chunk)] >= 0.0
        r = lambda i: part[i:i + 1]                   # (1, chunk)
        # perspective-correct weights from the riding inv_w (slots 32:35)
        w0 = b0c * r(32)
        w1 = b1c * r(33)
        w2 = b2c * r(34)
        inv_s = 1.0 / jnp.maximum(w0 + w1 + w2, 1e-12)
        w0 = w0 * inv_s
        w1 = w1 * inv_s
        w2 = w2 * inv_s
        nx = r(0) * w0 + r(3) * w1 + r(6) * w2
        ny = r(1) * w0 + r(4) * w1 + r(7) * w2
        nz = r(2) * w0 + r(5) * w1 + r(8) * w2
        inv_len = jax.lax.rsqrt(
            jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-12))
        u = r(9) * w0 + r(11) * w1 + r(13) * w2
        v = r(10) * w0 + r(12) * w1 + r(14) * w2
        # velocity uses SCREEN barycentrics (prev positions are affine in
        # screen space; see gbuffer.shade_gbuffer velocity notes)
        pxc = px[0:1, ch * chunk:(ch + 1) * chunk]
        pyc = py[0:1, ch * chunk:(ch + 1) * chunk]
        vel_x = pxc - (r(26) * b0c + r(28) * b1c + r(30) * b2c)
        vel_y = pyc - (r(27) * b0c + r(29) * b1c + r(31) * b2c)
        zero = jnp.zeros_like(u)
        g_out = jnp.concatenate([
            nx * inv_len, ny * inv_len, nz * inv_len,
            u, v,
            part[15:24],
            r(24), r(25),
            jnp.where(vis_m, vel_x, 0.0), jnp.where(vis_m, vel_y, 0.0),
            zero, zero, zero, zero, zero, zero,
        ], axis=0)                                    # (GBUF_CH, chunk)
        attrs_ref[:, pl.ds(ch * rows_per_chunk, rows_per_chunk), :] = \
            g_out.reshape(GBUF_CH, rows_per_chunk, tile)


def rasterize_visibility_shaded(
    setup: Dict[str, Array],
    shade_records: Array,   # (T, REC) per-triangle shading records
    tile_tris: Array,       # (tiles, C)
    counts: Array,          # (tiles,)
    big_list: Array,        # (B,) shared big-triangle list
    width: int,
    height: int,
    tile: int,
    tile_h: int = None,
    gbuf: bool = False,
) -> Tuple[Dict[str, Array], Array]:
    """Fused visibility raster + record shading.

    Returns (vis dict as rasterize_visibility, attrs (REC, H, W)) where
    attrs[:, y, x] is the winning triangle's shading record at each pixel
    (zeros where no triangle covers the pixel). See _raster_shade_kernel.

    gbuf=True: phase 3 finishes the G-buffer in-kernel and attrs is the
    (GBUF_CH, H, W) FINISHED plane block (normals normalized, uvs and
    velocity interpolated — consume with gbuffer.shade_gbuffer(gplanes=))
    instead of the raw record; the raw 40-channel per-pixel buffer
    (334 MB at 1080p) never reaches HBM.

    The shared big list FOLDS into each tile's block as a prefix (slots
    [0, B)), so phase 2 runs ONE one-hot contraction over the combined
    width instead of a second full-lane-padded big dot: size the binning
    so B + grid cap stays a 128 multiple (the flagship uses 32 + 96)."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    if not _interpret() and not tpu_tile_legal(tile, width, height, th):
        raise ValueError(
            f"rasterize_visibility_shaded: tile={tile}x{th} is not TPU-legal "
            f"for a {height}x{width} frame. Use tile_size=128."
        )
    # fold the shared big list in as a per-tile prefix
    b_fold = big_list.shape[0]
    big_tile = jnp.broadcast_to(big_list[None, :],
                                (tile_tris.shape[0], b_fold))
    tile_tris = jnp.concatenate([big_tile, tile_tris], axis=1)
    # the scan covers the (possibly sentinel-holed) big prefix plus the
    # tile's own entries; sentinel blocks rasterize nothing
    counts = counts + b_fold
    pad_to = 128  # lane alignment for the (REC, C) record block
    if tile_tris.shape[1] % pad_to:
        pad = pad_to - tile_tris.shape[1] % pad_to
        tile_tris = jnp.pad(tile_tris, ((0, 0), (0, pad)), constant_values=-1)
    c = tile_tris.shape[1]

    records = _pack_edge_records(setup)                     # (T + 1, 16)
    t_count = records.shape[0] - 1
    safe = _safe_ids(tile_tris, t_count)
    data = records[safe]                                    # (tiles, C, 16)

    rec_w = shade_records.shape[1]
    rec_pad = (-rec_w) % 8                                  # sublane align
    # sentinel shade row: zeros (empty pixels read record 0 of attrs)
    srec = jnp.pad(shade_records, ((0, 1), (0, rec_pad)))
    rec = srec.shape[1]
    # per-tile shade records, pre-transposed to (REC, C) so the kernel's
    # matmul needs no in-VMEM transpose; empty slots hit the zero sentinel
    shade = srec[safe].transpose(0, 2, 1)                   # (tiles, REC, C)

    grid = (tiles_y, tiles_x)
    out_block = pl.BlockSpec((th, tile), lambda ty, tx: (ty, tx),
                             memory_space=pltpu.VMEM)
    h_pad = tiles_y * th
    w_pad = tiles_x * tile
    counts2d = counts.reshape(1, n_tiles)
    n_px = th * tile
    chunk = min(2048, n_px)
    out_ch = GBUF_CH if gbuf else rec

    depth, tri_id, b0, b1, attrs = pl.pallas_call(
        functools.partial(_raster_shade_kernel, tile=tile, tiles_x=tiles_x,
                          rec=rec, chunk=chunk, tile_h=th, gbuf=gbuf),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tiles), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 16), lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rec, c), lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_block, out_block, out_block, out_block,
                   pl.BlockSpec((out_ch, th, tile),
                                lambda ty, tx: (0, ty, tx),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.int32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((out_ch, h_pad, w_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, n_px), jnp.float32)
                        for _ in range(5)],
        interpret=_interpret(),
    )(counts2d, data, shade)

    vis = {
        "depth": depth[:height, :width],
        "tri_id": tri_id[:height, :width],
        "b0": b0[:height, :width],
        "b1": b1[:height, :width],
    }
    return vis, attrs[:(18 if gbuf else rec_w), :height, :width]


def _blend_kernel(count_ref, bigcnt_ref, data_ref, big_ref, depth_ref,
                  r_ref, g_ref, b_ref,
                  ro_ref, go_ref, bo_ref, *, tile: int, tiles_x: int,
                  atlas_bounds: tuple = (), tile_h: int = None):
    """Ordered alpha-blend raster: triangles composite src-over IN BIN ORDER
    (big list first, then back-to-front when binned with a depth priority —
    the reference's sorted-translucent pass, mesh.hpp:204). Z-tested against
    the opaque depth plane (reverse-Z: pass when z >= opaque)."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    th = tile_h or tile
    tile_idx = ty * tiles_x + tx
    n_px = th * tile
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col
    py = (ty * th + 0.5) + row

    ro_ref[:] = r_ref[:]
    go_ref[:] = g_ref[:]
    bo_ref[:] = b_ref[:]
    opaque_z = depth_ref[:].reshape(1, n_px)

    def process(d):
        # sequential within the block: order matters for blending
        for k in range(TRI_BLOCK):
            x0 = d[k, 0]
            y0 = d[k, 1]
            x1 = d[k, 2]
            y1 = d[k, 3]
            x2 = d[k, 4]
            y2 = d[k, 5]
            z0 = d[k, 6]
            z1 = d[k, 7]
            z2 = d[k, 8]
            inv_area = d[k, 9]
            tri_id = d[k, 10]
            cr = d[k, 11]
            cg = d[k, 12]
            cb_ = d[k, 13]
            ca = d[k, 14]
            e0 = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
            e1 = (px - x2) * (y0 - y2) - (py - y2) * (x0 - x2)
            e2 = (px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            b0 = e0 * inv_area
            b1 = e1 * inv_area
            z = b0 * z0 + b1 * z1 + (1.0 - b0 - b1) * z2
            hit = inside & (z >= opaque_z) & (z <= 1.0) & (tri_id >= 0.0)
            if atlas_bounds:
                ci = d[k, 15]
                x0a = jnp.float32(0.0)
                x1a = jnp.float32(0.0)
                y0a = jnp.float32(0.0)
                y1a = jnp.float32(0.0)
                for i, (x0b, x1b, y0b, y1b) in enumerate(atlas_bounds):
                    m = ci == float(i)
                    x0a = jnp.where(m, float(x0b), x0a)
                    x1a = jnp.where(m, float(x1b), x1a)
                    y0a = jnp.where(m, float(y0b), y0a)
                    y1a = jnp.where(m, float(y1b), y1a)
                hit &= (px >= x0a) & (px < x1a) & (py >= y0a) & (py < y1a)
            a = jnp.where(hit, ca, 0.0).reshape(th, tile)
            ro_ref[:] = ro_ref[:] * (1.0 - a) + cr * a
            go_ref[:] = go_ref[:] * (1.0 - a) + cg * a
            bo_ref[:] = bo_ref[:] * (1.0 - a) + cb_ * a

    def body_big(cb, _):
        process(big_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    def body(cb, _):
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    nb_big = (bigcnt_ref[0, 0] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, nb_big, body_big, 0)
    n_blocks = (count_ref[0, tile_idx] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, n_blocks, body, 0)


def rasterize_sorted_blend(
    setup: Dict[str, Array],
    tri_rgba: Array,    # (T, 4) premixed color+alpha per triangle
    tile_tris: Array,
    counts: Array,
    big_list: Array,
    opaque_depth: Array,  # (H, W) reverse-Z
    hdr: Array,           # (H, W, 3) blend destination
    width: int,
    height: int,
    tile: int,
    atlas_bounds: tuple = (),
    tri_atlas: Array = None,
    tile_h: int = None,
) -> Array:
    """Alpha-blend binned triangles over the HDR in bin order (sorted
    translucent path — the Translucent render type, mesh.hpp:30-40).
    atlas_bounds: per-cascade (x0, x1, y0, y1) pixel rects."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    if not _interpret() and not tpu_tile_legal(tile, width, height, th):
        raise ValueError(
            f"rasterize_sorted_blend: tile={tile}x{th} not TPU-legal")
    if tile_tris.shape[1] % TRI_BLOCK:
        pad = TRI_BLOCK - tile_tris.shape[1] % TRI_BLOCK
        tile_tris = jnp.pad(tile_tris, ((0, 0), (0, pad)), constant_values=-1)
    c = tile_tris.shape[1]

    t_count = setup["valid"].shape[0]
    sx, sy, z = setup["sx"], setup["sy"], setup["z"]      # (3, T)
    xy = jnp.stack([sx[0], sy[0], sx[1], sy[1], sx[2], sy[2]], axis=-1)
    atlas_col = (tri_atlas.astype(jnp.float32)[:, None]
                 if tri_atlas is not None
                 else jnp.zeros((t_count, 1), jnp.float32))
    records = jnp.concatenate(
        [xy, jnp.stack([z[0], z[1], z[2]], axis=-1),
         setup["inv_area"][:, None],
         jnp.arange(t_count, dtype=jnp.float32)[:, None],   # tri_id
         tri_rgba,
         atlas_col],
        axis=-1,
    )
    # sentinel row: id -1, alpha 0 (empty slots blend nothing)
    records = jnp.concatenate(
        [records, jnp.zeros((1, 16), jnp.float32).at[0, 10].set(-1.0)],
        axis=0)
    data = records[_safe_ids(tile_tris, t_count)]
    big_data, bigcnt = _big_inputs(records, big_list)

    grid = (tiles_y, tiles_x)
    blk = pl.BlockSpec((th, tile), lambda ty, tx: (ty, tx),
                       memory_space=pltpu.VMEM)
    h_pad = tiles_y * th
    w_pad = tiles_x * tile
    depth_p = jnp.pad(opaque_depth,
                      ((0, h_pad - height), (0, w_pad - width)))
    hdr_p = jnp.pad(hdr, ((0, h_pad - height), (0, w_pad - width), (0, 0)))
    counts2d = counts.reshape(1, n_tiles)

    r, g, b = pl.pallas_call(
        functools.partial(_blend_kernel, tile=tile, tiles_x=tiles_x,
                          atlas_bounds=atlas_bounds, tile_h=th),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_tiles), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 16), lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_data.shape[1], 16),
                         lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            blk, blk, blk, blk,
        ],
        out_specs=(blk, blk, blk),
        out_shape=(
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
            jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        ),
        interpret=_interpret(),
    )(counts2d, bigcnt, data, big_data, depth_p,
      hdr_p[..., 0], hdr_p[..., 1], hdr_p[..., 2])
    return jnp.stack([r[:height, :width], g[:height, :width],
                      b[:height, :width]], axis=-1)


def _atlas_guard(d, px, py, atlas_bounds):
    """Cascade-atlas clip: lane 15 of each record holds the triangle's
    sub-rect index into the static `atlas_bounds` tuple of (x0, x1, y0, y1)
    pixel rects; clipped geometry extending past its cascade's ortho bounds
    must not bleed into a neighbor's atlas region. The per-rect bounds
    materialize as a short select chain (C is 2-4)."""
    idx = d[:, 15:16]
    x0a = jnp.zeros_like(idx)
    x1a = jnp.zeros_like(idx)
    y0a = jnp.zeros_like(idx)
    y1a = jnp.zeros_like(idx)
    for ci, (x0, x1, y0, y1) in enumerate(atlas_bounds):
        m = idx == float(ci)
        x0a = jnp.where(m, float(x0), x0a)
        x1a = jnp.where(m, float(x1), x1a)
        y0a = jnp.where(m, float(y0), y0a)
        y1a = jnp.where(m, float(y1), y1a)
    return (px >= x0a) & (px < x1a) & (py >= y0a) & (py < y1a)


def _depth_kernel(count_ref, bigcnt_ref, bound_ref, data_ref, big_ref,
                  depth_ref,
                  *, tile: int, tiles_x: int, atlas_bounds: tuple = (),
                  tile_h: int = None):
    """Depth-only raster (shadow cascades): the edge-coefficient loop of
    _raster_kernel with a plain max-reduce instead of the id/barycentric
    tournament — ~40% less VPU work per (triangle, pixel), and shadow maps
    are the most raster-saturated passes of the frame (3 cascades at
    2048^2 over a dense caster pile). The shared big block draws first
    (small, no termination), then the tile's grid list.

    EARLY-Z TERMINATION: `bound_ref` (SMEM) holds, per (tile, block), the
    max reverse-Z depth of ALL remaining grid record blocks (a suffix max
    built in rasterize_depth). With bins depth-ordered front-to-back from
    the light (bin_triangles priority=depth rank), once every pixel of the
    tile is covered at z >= that bound, no remaining caster can win the
    max-reduce and the loop stops — on a dense pile the occluded interior
    is ~90% of the binned casters."""
    th = tile_h or tile
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_idx = ty * tiles_x + tx
    n_px = th * tile
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col
    py = (ty * th + 0.5) + row

    depth_ref[:] = jnp.zeros((th, tile), jnp.float32)

    def process(d):
        e0 = d[:, 0:1] * px + d[:, 3:4] * py + d[:, 6:7]
        e1 = d[:, 1:2] * px + d[:, 4:5] * py + d[:, 7:8]
        e2 = d[:, 9:10] - e0 - e1
        inv_area = d[:, 13:14]
        tri_id = d[:, 14:15]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        z = (d[:, 10:11] + e0 * inv_area * d[:, 11:12]
             + e1 * inv_area * d[:, 12:13])
        cand = inside & (z <= 1.0) & (z > 0.0) & (tri_id >= 0.0)
        if atlas_bounds:
            cand &= _atlas_guard(d, px, py, atlas_bounds)
        zs = jnp.max(jnp.where(cand, z, 0.0), axis=0).reshape(th, tile)
        depth_ref[:] = jnp.maximum(depth_ref[:], zs)

    def body_big(cb, _):
        process(big_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    nb_big = (bigcnt_ref[0, 0] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, nb_big, body_big, 0)

    n_blocks = (count_ref[0, tile_idx] + TRI_BLOCK - 1) // TRI_BLOCK

    def cond(carry):
        cb, done = carry
        return (cb < n_blocks) & ~done

    def body(carry):
        cb, _ = carry
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        done = jnp.min(depth_ref[:]) >= bound_ref[cb + 1, tile_idx]
        return cb + 1, done

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def _depth_super_kernel(cnt_ref, data_ref, depth_ref,
                        *, tile: int, tiles_x: int, sup_x: int, sup_y: int,
                        sups_x: int, atlas_bounds: tuple = (),
                        tile_h: int = None):
    """Dense pass 1 of the split depth raster: every tile draws ONLY its
    super-tile's big block (bin_big_supertiles). The block arrives via a
    static index map (super of (ty, tx)), so consecutive tiles in the same
    super reuse the fetched block."""
    th = tile_h or tile
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    sup = (ty // sup_y) * sups_x + (tx // sup_x)
    n_px = th * tile
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col
    py = (ty * th + 0.5) + row

    depth_ref[:] = jnp.zeros((th, tile), jnp.float32)

    def process(d):
        e0 = d[:, 0:1] * px + d[:, 3:4] * py + d[:, 6:7]
        e1 = d[:, 1:2] * px + d[:, 4:5] * py + d[:, 7:8]
        e2 = d[:, 9:10] - e0 - e1
        inv_area = d[:, 13:14]
        tri_id = d[:, 14:15]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        z = (d[:, 10:11] + e0 * inv_area * d[:, 11:12]
             + e1 * inv_area * d[:, 12:13])
        cand = inside & (z <= 1.0) & (z > 0.0) & (tri_id >= 0.0)
        if atlas_bounds:
            cand &= _atlas_guard(d, px, py, atlas_bounds)
        zs = jnp.max(jnp.where(cand, z, 0.0), axis=0).reshape(th, tile)
        depth_ref[:] = jnp.maximum(depth_ref[:], zs)

    def body(cb, _):
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        return 0

    nb = (cnt_ref[0, sup] + TRI_BLOCK - 1) // TRI_BLOCK
    jax.lax.fori_loop(0, nb, body, 0)


def _depth_grid_kernel(act_ref, cnt_ref, bound_ref, data_ref, prior_ref,
                       depth_ref,
                       *, tile: int, tiles_x: int, atlas_bounds: tuple = (),
                       tile_h: int = None):
    """Compacted pass 2 of the split depth raster: grid slot i handles
    ACTIVE tile act_ref[i] only (scalar-prefetched ids drive the in/out
    index maps), max-merging its binned grid list onto pass 1's output
    (aliased in as prior_ref). Dummy tail slots (count 0) write the prior
    block back unchanged. Early-z: bound_ref (SMEM) column i holds the
    suffix max of remaining blocks' zmax (see rasterize_depth)."""
    th = tile_h or tile
    i = pl.program_id(0)
    tid = act_ref[i]
    ty = tid // tiles_x
    tx = tid % tiles_x
    n_px = th * tile
    ixf = jax.lax.broadcasted_iota(jnp.int32, (1, n_px), 1)
    col = (ixf % tile).astype(jnp.float32)
    row = (ixf // tile).astype(jnp.float32)
    px = (tx * tile + 0.5) + col
    py = (ty * th + 0.5) + row

    depth_ref[:] = prior_ref[:]

    def process(d):
        e0 = d[:, 0:1] * px + d[:, 3:4] * py + d[:, 6:7]
        e1 = d[:, 1:2] * px + d[:, 4:5] * py + d[:, 7:8]
        e2 = d[:, 9:10] - e0 - e1
        inv_area = d[:, 13:14]
        tri_id = d[:, 14:15]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        z = (d[:, 10:11] + e0 * inv_area * d[:, 11:12]
             + e1 * inv_area * d[:, 12:13])
        cand = inside & (z <= 1.0) & (z > 0.0) & (tri_id >= 0.0)
        if atlas_bounds:
            cand &= _atlas_guard(d, px, py, atlas_bounds)
        zs = jnp.max(jnp.where(cand, z, 0.0), axis=0).reshape(th, tile)
        depth_ref[:] = jnp.maximum(depth_ref[:], zs)

    n_blocks = (cnt_ref[i] + TRI_BLOCK - 1) // TRI_BLOCK

    def cond(carry):
        cb, done = carry
        return (cb < n_blocks) & ~done

    def body(carry):
        cb, _ = carry
        process(data_ref[0, pl.ds(cb * TRI_BLOCK, TRI_BLOCK), :])
        done = jnp.min(depth_ref[:]) >= bound_ref[cb + 1, i]
        return cb + 1, done

    jax.lax.while_loop(cond, body, (jnp.int32(0), False))


def rasterize_depth(
    setup: Dict[str, Array],
    tile_tris: Array,
    counts: Array,
    big_list: Array,
    width: int,
    height: int,
    tile: int,
    atlas_bounds: tuple = (),
    tri_atlas: Array = None,
    tile_h: int = None,
    sup_bins: Tuple = None,
    max_active: int = None,
    act_ids: Array = None,
) -> Array:
    """Depth-only raster (shadow maps: the CSM cascade passes,
    csm.hpp:36-64) via the reduced _depth_kernel. `atlas_bounds` (per-
    cascade (x0, x1, y0, y1) rects) + `tri_atlas` enable the cascade-atlas
    guard (see _atlas_guard).

    sup_bins + max_active select the SPLIT path for sparse targets (the
    cascade atlas: 252 of 3072 tiles occupied on the flagship): pass 1
    draws per-super-tile big lists (bin_big_supertiles) densely; pass 2
    draws the per-tile grid lists over a compacted 1D grid of the
    max_active most-populated tiles (scalar-prefetched tile ids), so the
    (tiles, C, 16) record fetch — 6.1 ms/frame on the dense-pile atlas —
    shrinks to (max_active, C, 16). Tiles beyond max_active lose their
    grid list (the least-populated ones), same drop semantics as per-tile
    cap overflow."""
    th = tile_h or tile
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    if not _interpret() and not tpu_tile_legal(tile, width, height, th):
        raise ValueError(
            f"rasterize_depth: tile={tile}x{th} is not TPU-legal for a "
            f"{height}x{width} target. Use tile_size=128.")
    if tile_tris.shape[1] % TRI_BLOCK:
        pad = TRI_BLOCK - tile_tris.shape[1] % TRI_BLOCK
        tile_tris = jnp.pad(tile_tris, ((0, 0), (0, pad)), constant_values=-1)
    c = tile_tris.shape[1]
    records = _pack_edge_records(setup, tri_atlas)
    t_count = records.shape[0] - 1
    if sup_bins is not None:
        return _rasterize_depth_split(
            records, tile_tris, counts, sup_bins,
            width, height, tile, th, atlas_bounds,
            max_active or max(n_tiles // 4, 1), act_ids)
    data = records[_safe_ids(tile_tris, t_count)]
    big_data, bigcnt = _big_inputs(records, big_list)
    counts2d = counts.reshape(1, n_tiles)
    # early-z bound table: per (tile, block) suffix max of record zmax
    # (zmax = z2 + max(dz0, dz1, 0), cols 10-12), so the kernel can stop
    # once the tile is covered closer to the light than everything left
    nb = c // TRI_BLOCK
    rec_zmax = data[:, :, 10] + jnp.maximum(
        jnp.maximum(data[:, :, 11], data[:, :, 12]), 0.0)
    rec_zmax = jnp.where(tile_tris >= 0, rec_zmax, -1.0)
    blk_zmax = rec_zmax.reshape(n_tiles, nb, TRI_BLOCK).max(axis=2)
    suffix = jnp.flip(jax.lax.cummax(jnp.flip(blk_zmax, 1), axis=1), 1)
    bound = jnp.concatenate(
        [suffix, jnp.full((n_tiles, 1), -1.0, jnp.float32)], axis=1).T
    h_pad = tiles_y * th
    w_pad = tiles_x * tile
    depth = pl.pallas_call(
        functools.partial(_depth_kernel, tile=tile, tiles_x=tiles_x,
                          atlas_bounds=atlas_bounds, tile_h=th),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((1, n_tiles), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((nb + 1, n_tiles), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, 16),
                         lambda ty, tx, _tx=tiles_x: (ty * _tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, big_data.shape[1], 16),
                         lambda ty, tx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tile), lambda ty, tx: (ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        interpret=_interpret(),
    )(counts2d, bigcnt, bound, data, big_data)
    return depth[:height, :width]


def _rasterize_depth_split(records, tile_tris, counts, sup_bins,
                           width, height, tile, th, atlas_bounds,
                           max_active, act_ids=None):
    """Two-pass depth raster for sparse targets (see rasterize_depth).
    act_ids: tile_tris/counts are ALREADY compacted to the active set
    (bin_triangles max_active=...) — skip the internal compaction."""
    sup_tris, sup_counts, (sup_x, sup_y, sups_x) = sup_bins
    tiles_x = -(-width // tile)
    tiles_y = -(-height // th)
    n_tiles = tiles_x * tiles_y
    n_sup = sup_counts.shape[0]
    t_count = records.shape[0] - 1
    c = tile_tris.shape[1]
    h_pad = tiles_y * th
    w_pad = tiles_x * tile

    # pass 1: per-super-tile big lists, dense grid (consecutive tiles in a
    # super reuse the fetched block)
    st = sup_tris
    if st.shape[1] % TRI_BLOCK:
        st = jnp.pad(st, ((0, 0), (0, TRI_BLOCK - st.shape[1] % TRI_BLOCK)),
                     constant_values=-1)
    capb = st.shape[1]
    sup_data = records[_safe_ids(st, t_count)]            # (n_sup, capB, 16)
    supcnt = sup_counts.reshape(1, n_sup)
    prior = pl.pallas_call(
        functools.partial(_depth_super_kernel, tile=tile, tiles_x=tiles_x,
                          sup_x=sup_x, sup_y=sup_y, sups_x=sups_x,
                          atlas_bounds=atlas_bounds, tile_h=th),
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((1, n_sup), lambda ty, tx: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, capb, 16),
                         lambda ty, tx, _sx=sup_x, _sy=sup_y, _nx=sups_x:
                         ((ty // _sy) * _nx + tx // _sx, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tile), lambda ty, tx: (ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        interpret=_interpret(),
    )(supcnt, sup_data)

    # pass 2: compacted grid lists over the max_active most-populated tiles
    if act_ids is None:
        a = min(max_active, n_tiles)
        _, act_ids = jax.lax.top_k(counts, a)
        act_ids = act_ids.astype(jnp.int32)
        act_cnt = counts[act_ids].astype(jnp.int32)
        tt_c = tile_tris[act_ids]                         # (A, C) small
    else:
        a = act_ids.shape[0]
        act_cnt = counts.astype(jnp.int32)
        tt_c = tile_tris
    data_c = records[_safe_ids(tt_c, t_count)]            # (A, C, 16)
    nb = c // TRI_BLOCK
    rec_zmax = data_c[:, :, 10] + jnp.maximum(
        jnp.maximum(data_c[:, :, 11], data_c[:, :, 12]), 0.0)
    rec_zmax = jnp.where(tt_c >= 0, rec_zmax, -1.0)
    blk_zmax = rec_zmax.reshape(a, nb, TRI_BLOCK).max(axis=2)
    suffix = jnp.flip(jax.lax.cummax(jnp.flip(blk_zmax, 1), axis=1), 1)
    bound = jnp.concatenate(
        [suffix, jnp.full((a, 1), -1.0, jnp.float32)], axis=1).T  # (nb+1, A)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                   # act_ids, act_cnt
        grid=(a,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),         # bound, full
            pl.BlockSpec((1, c, 16), lambda i, act, cnt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, tile),
                         lambda i, act, cnt, _tx=tiles_x:
                         (act[i] // _tx, act[i] % _tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, tile),
                               lambda i, act, cnt, _tx=tiles_x:
                               (act[i] // _tx, act[i] % _tx),
                               memory_space=pltpu.VMEM),
    )
    depth = pl.pallas_call(
        functools.partial(_depth_grid_kernel, tile=tile, tiles_x=tiles_x,
                          atlas_bounds=atlas_bounds, tile_h=th),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h_pad, w_pad), jnp.float32),
        input_output_aliases={4: 0},
        interpret=_interpret(),
    )(act_ids, act_cnt, bound, data_c, prior)
    return depth[:height, :width]


def render_pass(
    clip: Array,
    indices: Array,
    tri_valid: Array,
    width: int,
    height: int,
    tile: int,
    max_per_tile: int,
) -> Tuple[Dict[str, Array], Dict[str, Array]]:
    """Full raster pass: setup -> bin -> rasterize. Returns (vis, setup)."""
    setup = setup_triangles(clip, indices, tri_valid, width, height)
    tile_tris, counts, big = bin_triangles(setup, width, height, tile,
                                           max_per_tile)
    vis = rasterize_visibility(setup, tile_tris, counts, big,
                               width, height, tile)
    return vis, setup
