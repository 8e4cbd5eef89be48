"""Broadphase: uniform spatial grid over sorted cell keys.

Rebuild of Jolt's broadphase pair sweep as invoked by the reference
(source/system/physics.cpp:1186-1193 steps JPH::PhysicsSystem::Update which
runs its quad-tree broadphase; capacity contract maxBodyPairCount=65536 at
include/garden/system/physics.hpp:680). A quad-tree walk is pointer-chasing
and TPU-hostile; the idiomatic device analog is a uniform grid.

TPU cost model (measured): random gathers are the scarce resource (~5-7
GB/s effective vs ~100 GB/s for dense ops), so the design minimizes gather
count and volume:

1. each body's AABB inserts into the (up to) 2x2x2 cells it touches —
   8 keys per body, ONE packed sort of (cell << bits | body)
2. a dense cell->run table (two scatters) locates each cell's entries
3. each body scans only the cells ITS AABB touches: run-position arithmetic
   + ONE int gather for candidate ids (N, 8*cand_per_cell)
4. every pair-relevant per-body attribute (AABB, layer bits, flags) is
   packed into ONE (N, 12) record so all masks come from a single row
   gather, computed densely afterwards
5. duplicate pair findings (the same pair shared by several cells) are
   killed by the standard home-cell rule: a pair counts only in the cell
   containing max(aabb_min_i, aabb_min_j)
6. compaction to the per-body budget via top_k over the (already small)
   candidate row

Bodies whose AABB exceeds a cell (planes, heightfields, long boxes) are
"global" bodies: every body is tested against all `max_globals` of them,
bypassing the grid (Jolt's NonMoving broadphase layer plays a similar role,
physics.hpp:194-225).

Output is `(cand_idx, valid)` in a fixed (N, K) layout: body i's k-th
candidate. Overflow beyond K candidates is dropped, mirroring Jolt's fixed
pair budget.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.physics import shapes as sh

Array = jnp.ndarray


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
    """Return (cand_idx int32[N, K], cand_valid bool[N, K]),
    K = max_candidates + max_globals. Grid pairs appear in BOTH rows
    (symmetric row layout, see solver.py); rows exist only for dynamic
    bodies."""
    n = pos.shape[0]
    half_world = 0.5 * cell_size * grid_dim
    inv_cs = 1.0 / cell_size

    # oversized AABBs can't use the 2x2x2 insertion; they become implicit
    # globals only if flagged; otherwise clamp (correctness degrades only
    # for bodies larger than a cell — configure cell_size >= max body size)
    cmin = jnp.clip(jnp.floor((aabb_min + half_world) * inv_cs).astype(jnp.int32),
                    0, grid_dim - 1)
    cmax = jnp.clip(jnp.floor((aabb_max + half_world) * inv_cs).astype(jnp.int32),
                    0, grid_dim - 1)
    cmax = jnp.minimum(cmax, cmin + 1)      # at most 2 cells per axis

    in_grid = active & ~is_global
    n_cells = grid_dim ** 3 + 2             # + sentinel + spare
    sentinel = n_cells - 1

    # 1. 8 insertion keys per body (dups where the AABB spans < 2 cells are
    # collapsed to the sentinel so each (cell, body) appears once)
    offs = np.array([(ox, oy, oz) for ox in (0, 1) for oy in (0, 1)
                     for oz in (0, 1)], np.int32)        # (8, 3)
    cell8 = cmin[:, None, :] + offs[None, :, :]          # (N, 8, 3)
    covered = jnp.all(cell8 <= cmax[:, None, :], axis=-1)
    key8 = (cell8[..., 0] * grid_dim + cell8[..., 1]) * grid_dim + cell8[..., 2]
    key8 = jnp.where(covered & in_grid[:, None], key8, sentinel)  # (N, 8)

    body_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    body8 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, 8))
    packed = jnp.sort((key8.reshape(-1) << body_bits) | body8.reshape(-1))
    key_sorted = packed >> body_bits
    body_sorted = packed & ((1 << body_bits) - 1)        # (8N,)

    # 2. dense cell -> run table (two scatters over the sorted keys)
    m = key_sorted.shape[0]
    idxs = jnp.arange(m, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    run_end = jnp.concatenate(
        [key_sorted[1:] != key_sorted[:-1], jnp.ones((1,), bool)])
    start_tab = jnp.full((n_cells,), m, jnp.int32).at[
        jnp.where(run_start, key_sorted, n_cells)].set(idxs, mode="drop")
    end_tab = jnp.zeros((n_cells,), jnp.int32).at[
        jnp.where(run_end, key_sorted, n_cells)].set(idxs + 1, mode="drop")

    # 3. scan the body's own 8 cells: run positions + ONE candidate gather
    scan_key = jnp.where(covered, key8, sentinel)        # (N, 8)
    start = start_tab[scan_key]                          # (N, 8) tiny gathers
    end = end_tab[scan_key]
    take = jnp.arange(cand_per_cell, dtype=jnp.int32)
    gpos = start[:, :, None] + take[None, None, :]       # (N, 8, C)
    in_run = gpos < end[:, :, None]
    gpos = jnp.clip(gpos, 0, m - 1)
    cand = body_sorted[gpos.reshape(n, -1)]              # (N, 8C) THE gather
    cand_valid = in_run.reshape(n, -1)
    k8c = cand.shape[1]

    # 4. per-body pair record, gathered ONCE: [min3 | max3 | layer |
    # layer-accept-bits | active&dynamic flags | home-clamp coords]
    accept_bits = jnp.sum(
        layer_table[layer].astype(jnp.int32)
        * (1 << jnp.arange(layer_table.shape[0], dtype=jnp.int32))[None, :],
        axis=-1)                                          # int bitmask per body
    flags = (active.astype(jnp.int32)
             + 2 * dynamic.astype(jnp.int32)
             + 4 * is_global.astype(jnp.int32))
    record = jnp.concatenate(
        [aabb_min, aabb_max,
         layer.astype(jnp.float32)[:, None],
         accept_bits.astype(jnp.float32)[:, None],
         flags.astype(jnp.float32)[:, None],
         jnp.zeros((n, 3), jnp.float32)],
        axis=-1)                                          # (N, 12)
    rec_j = record[cand]                                  # (N, 8C, 12) gather

    jmin = rec_j[..., 0:3]
    jmax = rec_j[..., 3:6]
    jlayer = rec_j[..., 6].astype(jnp.int32)
    jflags = rec_j[..., 8].astype(jnp.int32)
    j_active = (jflags & 1) == 1

    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = cand_valid & (cand != i_idx)
    valid &= active[:, None] & j_active
    valid &= dynamic[:, None]
    # layer filter from the precomputed accept bitmask (no table gather)
    valid &= ((accept_bits[:, None] >> jlayer) & 1) == 1
    # AABB overlap (dense)
    valid &= jnp.all(aabb_min[:, None, :] <= jmax, axis=-1)
    valid &= jnp.all(jmin <= aabb_max[:, None, :], axis=-1)
    # home-cell dedup: the pair counts only in the cell holding the
    # component-wise max of the two AABB minima
    home = jnp.clip(jnp.floor(
        (jnp.maximum(aabb_min[:, None, :], jmin) + half_world) * inv_cs
    ).astype(jnp.int32), 0, grid_dim - 1)
    home_key = (home[..., 0] * grid_dim + home[..., 1]) * grid_dim \
        + home[..., 2]
    scanned = jnp.repeat(scan_key, cand_per_cell, axis=1)  # (N, 8C)
    valid &= home_key == scanned

    # 5. compact to the per-body budget (stable order)
    rank_key = jnp.where(
        valid, k8c - jnp.arange(k8c, dtype=jnp.int32)[None, :], 0)
    _, sel = jax.lax.top_k(rank_key, max_candidates)      # (N, K)
    # dense one-hot compaction (see core/math3d.py gather notes)
    grid_idx = m3.gather_scalars(cand.astype(jnp.float32), sel).astype(jnp.int32)
    grid_valid = m3.gather_scalars(valid.astype(jnp.float32), sel) > 0.5

    # 6. global bodies: first `max_globals` by index, tested against everyone
    gscore = jnp.where(is_global & active, 1, 0)
    _, gidx = jax.lax.top_k(gscore, max_globals)          # (G,)
    gvalid = (is_global & active)[gidx]                   # (G,)
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
