"""Microbenchmark: argsort-based vs sort-free tile binning on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from garden_tpu.render import raster

T = 122880        # ~123K triangles (10K cubes)
W, H = 1920, 1080
TILE = 128
CAP = 512

rng = np.random.default_rng(0)
# synthetic screen-space triangles, mostly small
cx = rng.uniform(0, W, T).astype(np.float32)
cy = rng.uniform(0, H, T).astype(np.float32)
size = rng.uniform(2, 40, T).astype(np.float32)
sx = np.stack([cx - size, cx + size, cx], -1)
sy = np.stack([cy - size, cy, cy + size], -1)
setup = {
    "sx": jnp.asarray(sx), "sy": jnp.asarray(sy),
    "z": jnp.asarray(rng.uniform(0, 1, (T, 3)).astype(np.float32)),
    "inv_w": jnp.ones((T, 3), jnp.float32),
    "inv_area": jnp.ones((T,), jnp.float32),
    "xmin": jnp.asarray(sx.min(-1)), "xmax": jnp.asarray(sx.max(-1)),
    "ymin": jnp.asarray(sy.min(-1)), "ymax": jnp.asarray(sy.max(-1)),
    "valid": jnp.asarray(rng.uniform(size=T) < 0.9),
}


def bin_dense(setup, width, height, tile, max_per_tile, max_big=64):
    """Sort-free binning: dense (T, tiles) footprint mask -> per-tile ranks
    via cumsum -> scatter pairs into the tile lists."""
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    n_tiles = tiles_x * tiles_y
    t = setup["valid"].shape[0]
    FOOT = raster.FOOT

    tx0 = jnp.clip(jnp.floor(setup["xmin"] / tile).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(setup["xmax"] / tile).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(setup["ymin"] / tile).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(setup["ymax"] / tile).astype(jnp.int32), 0, tiles_y - 1)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    small = setup["valid"] & (nx <= FOOT) & (ny <= FOOT)
    big = setup["valid"] & ~small

    # dense footprint mask (T, n_tiles)
    tlx = jnp.arange(n_tiles, dtype=jnp.int32) % tiles_x
    tly = jnp.arange(n_tiles, dtype=jnp.int32) // tiles_x
    mask = (small[:, None]
            & (tlx[None, :] >= tx0[:, None]) & (tlx[None, :] <= tx1[:, None])
            & (tly[None, :] >= ty0[:, None]) & (tly[None, :] <= ty1[:, None]))
    ranks = jnp.cumsum(mask.astype(jnp.int32), axis=0) - mask.astype(jnp.int32)
    counts_small = ranks[-1] + mask[-1].astype(jnp.int32)      # (n_tiles,)

    # pair emission (like the argsort path) + rank gather + scatter
    k = jnp.arange(FOOT * FOOT, dtype=jnp.int32)
    kx = k % FOOT
    ky = k // FOOT
    ptx = tx0[:, None] + kx[None, :]
    pty = ty0[:, None] + ky[None, :]
    pair_ok = small[:, None] & (kx[None, :] < nx[:, None]) & (ky[None, :] < ny[:, None])
    key = pty * tiles_x + ptx                                   # (T, F2)
    tri_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[:, None], key.shape)
    flat = jnp.where(pair_ok, tri_ids * n_tiles + key, 0)
    rank = jnp.take(ranks.reshape(-1), flat.reshape(-1)).reshape(key.shape)
    keep = pair_ok & (rank < max_per_tile)
    dst_tile = jnp.where(keep, key, n_tiles)                   # OOB -> dropped
    dst_slot = jnp.where(keep, rank, 0)
    tile_tris = jnp.full((n_tiles + 1, max_per_tile), -1, jnp.int32)
    tile_tris = tile_tris.at[dst_tile.reshape(-1), dst_slot.reshape(-1)].set(
        tri_ids.reshape(-1), mode="drop")[:n_tiles]

    # big triangles: fixed global list prepended to every tile
    max_big = min(max_big, t)
    big_rank = jnp.where(big, 1, 0)
    _, big_idx = jax.lax.top_k(big_rank, max_big)
    big_ok = big[big_idx]
    big_list = jnp.where(big_ok, big_idx.astype(jnp.int32), -1)
    n_big = jnp.sum(big_ok).astype(jnp.int32)
    # compact the big list to the front (argsort of max_big elems: tiny)
    order = jnp.argsort(jnp.where(big_list >= 0, 0, 1), stable=True)
    big_list = big_list[order]
    big_tile = jnp.broadcast_to(big_list[None, :], (n_tiles, max_big))

    # bigs FIRST and compacted, then smalls (smalls are contiguous by rank)
    tile_tris = jnp.concatenate([big_tile, tile_tris], axis=1)
    counts = jnp.minimum(counts_small, max_per_tile) + n_big
    # rotate each row so valid entries are contiguous: bigs occupy [0, n_big),
    # smalls start at max_big; shift smalls left by (max_big - n_big)
    # (single roll by a traced scalar is cheap)
    shift = max_big - n_big
    idx = (jnp.arange(max_big + max_per_tile)[None, :])
    src = jnp.where(idx < n_big, idx, idx + shift)
    src = jnp.clip(src, 0, max_big + max_per_tile - 1)
    tile_tris = jnp.take_along_axis(tile_tris, jnp.broadcast_to(src, tile_tris.shape), axis=1)
    return tile_tris, counts


def main():
    for name, fn in (
        ("argsort bin", lambda s: raster.bin_triangles(s, W, H, TILE, CAP)),
        ("dense bin", lambda s: bin_dense(s, W, H, TILE, CAP)),
    ):
        jfn = jax.jit(fn)
        out = jfn(setup)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = jfn(setup)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"{name:<16s} {ms:8.2f} ms")

    # equivalence check (sets per tile must match)
    a_tiles, a_counts = jax.jit(lambda s: raster.bin_triangles(s, W, H, TILE, CAP))(setup)
    b_tiles, b_counts = jax.jit(lambda s: bin_dense(s, W, H, TILE, CAP))(setup)
    a_counts = np.asarray(a_counts)
    b_counts = np.asarray(b_counts)
    mism = 0
    at, bt = np.asarray(a_tiles), np.asarray(b_tiles)
    for i in range(at.shape[0]):
        sa = set(at[i][at[i] >= 0].tolist())
        sb = set(bt[i][bt[i] >= 0].tolist())
        if sa != sb:
            mism += 1
            if mism < 3:
                print("tile", i, "only-argsort", list(sa - sb)[:5],
                      "only-dense", list(sb - sa)[:5],
                      "counts", a_counts[i], b_counts[i])
    print(f"counts equal: {(a_counts == b_counts).all()}, mismatched tiles: {mism}")


if __name__ == "__main__":
    main()
