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
   8 keys per body; cell keys are HASHED down to O(bodies) buckets (dense
   giant-grid tables cost milliseconds of init traffic while ~99% empty),
   then ONE packed sort of (bucket << bits | body)
2. a (bucket, slot) -> 8-lane record-row table is built with one row
   scatter; each entry carries [body id | aabb min/max | layer+active] so
   every downstream filter is dense
3. each body row-gathers its 8 cells' record lists (N*8 row gathers — TPU
   gathers price per ROW; scalar and per-candidate-row designs measured
   4.7/1.2 ms at 10K bodies, this one ~0.9 ms)
4. all pair filters (AABB overlap, layers, self, active) run densely on
   the fetched rows
5. duplicate pair findings (the same pair shared by several cells, or
   injected by a hash-bucket collision) are killed by the home-cell rule:
   a pair counts only in the cell containing max(aabb_min_i, aabb_min_j)
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

    # the 2x2x2 insertion is exact only when every grid AABB spans
    # <= 2*cell_size per axis; world.collide() enforces that invariant by
    # clamping the speculative margin and routing over-span non-dynamic
    # bodies through the global list before calling here
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

    # 2. hash the cell space down to O(bodies) buckets: a dense
    # grid_dim^3-cell table costs ~5 ms/step of init/reshape traffic at
    # 10K bodies (64^3 cells = 67 MB) while being ~99% empty. Bucket
    # collisions between occupied cells only ADD candidates (killed by the
    # AABB/home-cell filters below); colliding cells share the bucket's
    # slot capacity — the same fixed-capacity drop contract as everywhere
    # else. Small grids index directly (no collisions at all). Hashing
    # also shrinks the sort key, keeping the fast packed single-operand
    # sort path at every grid size.
    h_target = 1 << max(int(np.ceil(np.log2(max(4 * n, 1024)))), 1)
    if n_cells <= h_target:
        n_buckets = n_cells
        sentinel_bucket = sentinel
        hkey8 = key8
    else:
        n_buckets = h_target + 1
        sentinel_bucket = h_target
        hmul = jnp.uint32(2654435761)
        h = (key8.astype(jnp.uint32) * hmul) >> jnp.uint32(12)
        hkey8 = jnp.where(key8 >= sentinel, sentinel_bucket,
                          (h & jnp.uint32(h_target - 1)).astype(jnp.int32))

    body_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
    key_bits = max(int(np.ceil(np.log2(n_buckets + 1))), 1)
    body8 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, 8))
    if key_bits + body_bits <= 31:
        # single packed sort (key<<bits | body): one operand, fastest path
        packed = jnp.sort((hkey8.reshape(-1) << body_bits) | body8.reshape(-1))
        key_sorted = packed >> body_bits
        body_sorted = packed & ((1 << body_bits) - 1)    # (8N,)
    else:
        # huge body counts: int32 pack overflows; variadic sort fallback
        # (wrapped-negative keys would be silently dropped by the scatter,
        # killing collisions for half the grid — the round-2 bug)
        key_sorted, body_sorted = jax.lax.sort(
            (hkey8.reshape(-1), body8.reshape(-1)), num_keys=1)

    # 3. dense (bucket, slot) -> PACKED int32 table via one SCALAR
    # scatter: id | layer<<17 | active<<20 per entry. Round 3 scattered
    # 8-float record rows here (id + AABB + meta) and the row scatter was
    # the physics step's hottest op (3.7 ms at 10K bodies); a scalar
    # scatter of the same entry count moves 8x less data and lets the
    # AABBs come back through the cheaper per-candidate ROW gather below
    # (1.2 ms measured) instead of riding the scatter. Slot within a
    # bucket's run comes from run-position arithmetic (cummax of
    # run-start indices); entries beyond cand_per_cell drop.
    m = key_sorted.shape[0]
    idxs = jnp.arange(m, dtype=jnp.int32)
    run_start = jnp.concatenate(
        [jnp.ones((1,), bool), key_sorted[1:] != key_sorted[:-1]])
    seg_start = jax.lax.cummax(jnp.where(run_start, idxs, 0))
    slot = idxs - seg_start                              # (8N,)
    c_per = cand_per_cell

    assert n <= (1 << 17), "packed broadphase entry caps at 131072 bodies"
    packed_all = (jnp.arange(n, dtype=jnp.int32)
                  | (layer << 17) | (active.astype(jnp.int32) << 20))
    packed_entry = packed_all[body_sorted]               # one scalar gather
    pos = jnp.where((slot < c_per) & (key_sorted < sentinel_bucket),
                    key_sorted * c_per + slot, n_buckets * c_per)
    cell_tab = jnp.full((n_buckets * c_per,), -1, jnp.int32).at[
        pos].set(packed_entry, mode="drop").reshape(n_buckets, c_per)

    # 4. each body row-gathers its own 8 cells' candidate id lists
    # (N*8 narrow rows), then row-gathers the candidates' AABBs from the
    # (N, 6) record table (N*8C rows — TPU gathers price per ROW)
    scan_key = jnp.where(covered, key8, sentinel)        # (N, 8) true keys
    scan_bucket = jnp.where(covered, hkey8, sentinel_bucket)
    ents = cell_tab[scan_bucket].reshape(n, 8 * c_per)   # (N, 8C) ints
    cand_valid = ents >= 0
    cand = jnp.where(cand_valid, ents & 0x1FFFF, 0)      # (N, 8C)
    jlayer = jnp.where(cand_valid, (ents >> 17) & 7, 0)
    j_active = cand_valid & (((ents >> 20) & 1) == 1)
    record6 = jnp.concatenate([aabb_min, aabb_max], axis=-1)  # (N, 6)
    rows = record6[cand]                                 # (N, 8C, 6)
    jmin = rows[..., 0:3]
    jmax = rows[..., 3:6]
    k8c = cand.shape[1]

    # 4. pair filters, all dense on the fetched rows
    accept_bits = jnp.sum(
        layer_table[layer].astype(jnp.int32)
        * (1 << jnp.arange(layer_table.shape[0], dtype=jnp.int32))[None, :],
        axis=-1)                                          # int bitmask per body

    i_idx = jnp.arange(n, dtype=jnp.int32)[:, None]
    valid = cand_valid & (cand != i_idx)
    valid &= active[:, None] & j_active
    valid &= dynamic[:, None]
    # layer filter from the precomputed accept bitmask (no table gather)
    valid &= ((accept_bits[:, None] >> jlayer) & 1) == 1
    # AABB overlap (dense)
    valid &= jnp.all(aabb_min[:, None, :] <= jmax, axis=-1)
    valid &= jnp.all(jmin <= aabb_max[:, None, :], axis=-1)
    # home-cell dedup: the pair counts only in the TRUE cell holding the
    # component-wise max of the two AABB minima (cheap dense math; also
    # kills candidates that arrived via a hash-bucket collision, since
    # their home cell is never the scanned cell). Exact because
    # world.collide() guarantees every span fits the 2x2x2 insertion.
    home = jnp.clip(jnp.floor(
        (jnp.maximum(aabb_min[:, None, :], jmin) + half_world) * inv_cs
    ).astype(jnp.int32), 0, grid_dim - 1)
    home_key = (home[..., 0] * grid_dim + home[..., 1]) * grid_dim \
        + home[..., 2]
    scanned = jnp.repeat(scan_key, c_per, axis=1)        # (N, 8C)
    valid &= home_key == scanned

    # 5. compact to the per-body budget (stable ascending-id order — the
    # same order in both rows of a pair)
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
