"""Broadphase: uniform spatial grid over sorted cell keys.

Rebuild of Jolt's broadphase pair sweep as invoked by the reference
(source/system/physics.cpp:1186-1193 steps JPH::PhysicsSystem::Update which
runs its quad-tree broadphase; capacity contract maxBodyPairCount=65536 at
include/garden/system/physics.hpp:680). A quad-tree walk is pointer-chasing
and TPU-hostile; the idiomatic device analog is a uniform grid:

1. quantize each body's AABB center to a grid cell, key = linear cell id
2. argsort bodies by key (one global sort — the TPU 'sweep')
3. per body, gather up to `cand_per_cell` bodies from each of the 27
   neighboring cells via vectorized searchsorted range lookups
4. mask: AABB overlap, i<j dedup, layer filter, not both non-dynamic
5. compact to a fixed per-body candidate budget with top_k

Bodies whose AABB exceeds a cell (planes, heightfields, long boxes) are
"global" bodies: every body is tested against all `max_globals` of them,
bypassing the grid (Jolt's NonMoving broadphase layer plays a similar role,
physics.hpp:194-225).

Output is `(pairs_i, pairs_j, valid)` in a fixed (N, K) layout: body i's k-th
candidate. Overflow beyond K candidates is dropped, mirroring Jolt's fixed
pair budget.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.physics import shapes as sh

Array = jnp.ndarray

NEIGHBOR_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def body_aabbs(pos: Array, quat: Array, stype: Array, params: Array,
               margin: float = 0.0, hull_ext: Array = None,
               comp_ext: Array = None) -> Tuple[Array, Array]:
    """World AABBs for all bodies, expanded by the speculative margin."""
    lmin, lmax = sh.local_aabb(stype, params, hull_ext=hull_ext,
                               comp_ext=comp_ext)
    wmin, wmax = m3.aabb_transform(lmin, lmax, pos, quat)
    return wmin - margin, wmax + margin


def find_candidates(
    pos: Array,
    aabb_min: Array,
    aabb_max: Array,
    active: Array,
    dynamic: Array,
    layer: Array,           # int32[N]
    layer_table: Array,     # bool[L, L] collision filter table
    is_global: Array,       # bool[N] grid-bypassing big bodies
    *,
    cell_size: float,
    grid_dim: int,
    cand_per_cell: int,
    max_candidates: int,
    max_globals: int,
) -> Tuple[Array, Array]:
    """Return (cand_idx int32[N, K], cand_valid bool[N, K]).

    K = max_candidates + max_globals. Candidate pairs are emitted once with
    i < j for grid pairs; global-body pairs are emitted on the non-global
    side (dynamic vs plane etc.).
    """
    n = pos.shape[0]
    half_world = 0.5 * cell_size * grid_dim
    center = 0.5 * (aabb_min + aabb_max)

    # 1. cell keys (global bodies parked in a sentinel cell)
    cell = jnp.clip(
        jnp.floor((center + half_world) / cell_size).astype(jnp.int32),
        0, grid_dim - 1,
    )
    key = (cell[:, 0] * grid_dim + cell[:, 1]) * grid_dim + cell[:, 2]
    sentinel = grid_dim ** 3 + 1
    key = jnp.where(active & ~is_global, key, sentinel)

    # 2. sort bodies by key and build a dense cell->run table.
    # (A binary-search lookup — jnp.searchsorted — costs ~60ms and ~9min of
    # compile at 10K bodies on TPU: it serializes dependent gathers. The
    # dense table is two cheap scatters + direct gathers: ~10x faster.)
    order = jnp.argsort(key)
    sorted_key = key[order]
    n_cells = grid_dim ** 3 + 2  # + sentinel cell + 1 spare
    idxs = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]])
    run_end = jnp.concatenate(
        [sorted_key[1:] != sorted_key[:-1], jnp.ones((1,), bool)])
    start_tab = jnp.full((n_cells,), n, jnp.int32).at[
        jnp.where(run_start, sorted_key, n_cells)
    ].set(idxs, mode="drop")
    end_tab = jnp.zeros((n_cells,), jnp.int32).at[
        jnp.where(run_end, sorted_key, n_cells)
    ].set(idxs + 1, mode="drop")

    # 3. candidate gather from 27 neighbor cells
    offs = jnp.array(
        [(o[0] * grid_dim + o[1]) * grid_dim + o[2] for o in NEIGHBOR_OFFSETS],
        dtype=jnp.int32,
    )  # (27,)
    # neighbor cell keys per body: (N, 27); clamp-generated duplicates at the
    # grid border are deduped by the overlap masks downstream
    ncell = jnp.clip(key[:, None] + offs[None, :], 0, n_cells - 1)
    start = start_tab[ncell]                                   # (N, 27)
    end = end_tab[ncell]                                       # (N, 27)
    take = jnp.arange(cand_per_cell, dtype=jnp.int32)          # (C,)
    gather_pos = start[:, :, None] + take[None, None, :]       # (N, 27, C)
    in_range = gather_pos < end[:, :, None]
    gather_pos = jnp.clip(gather_pos, 0, n - 1)
    cand = order[gather_pos.reshape(n, -1)]                    # (N, 27*C)
    cand_valid = in_range.reshape(n, -1)

    # 4. masks. Symmetric row layout (see solver.py): every pair (i, j)
    # appears in BOTH rows i and j — no i<j dedup. Rows exist only for
    # dynamic bodies (static rows would compute zero impulses).
    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    cand_valid &= cand != i_idx
    cand_valid &= active[:, None] & active[cand]
    cand_valid &= dynamic[:, None]
    # layer filter
    cand_valid &= layer_table[layer[:, None], layer[cand]]
    # AABB overlap
    cand_valid &= m3.aabb_overlap(
        aabb_min[:, None, :], aabb_max[:, None, :],
        aabb_min[cand], aabb_max[cand],
    )

    # 5. compact to per-body budget: keep first K valid via top_k on a key
    # that prefers valid entries and preserves order among them.
    m = cand.shape[1]
    rank_key = jnp.where(
        cand_valid,
        m - jnp.arange(m, dtype=jnp.int32)[None, :],
        0,
    )
    _, sel = jax.lax.top_k(rank_key, max_candidates)          # (N, K)
    grid_idx = jnp.take_along_axis(cand, sel, axis=1)
    grid_valid = jnp.take_along_axis(cand_valid, sel, axis=1)

    # 6. global bodies: first `max_globals` by index, tested against everyone
    gscore = jnp.where(is_global & active, 1, 0)
    _, gidx = jax.lax.top_k(gscore, max_globals)               # (G,)
    gvalid = (is_global & active)[gidx]                         # (G,)
    gidx_b = jnp.broadcast_to(gidx[None, :], (n, max_globals))
    gvalid_b = (
        gvalid[None, :]
        & active[:, None]
        & dynamic[:, None]
        & ~is_global[:, None]
        & layer_table[layer[:, None], layer[gidx_b]]
    )

    # globals FIRST: contact compaction keeps the first valid slots, and
    # dropping a ground-plane contact in a dense pile means tunneling
    cand_idx = jnp.concatenate([gidx_b, grid_idx], axis=1)
    valid = jnp.concatenate([gvalid_b, grid_valid], axis=1)
    return cand_idx.astype(jnp.int32), valid
