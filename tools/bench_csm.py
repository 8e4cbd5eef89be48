"""CSM-in-isolation device-time bench at the flagship workload.

Builds the north-star caster set (10K-cube pile + ground, 123K triangles),
jits ONLY fit_cascades + render_cascades (+ resolve with --resolve), and
prints the xprof per-op table plus occupancy diagnostics (non-empty atlas
tiles, per-tile count histogram, big-list population) — the numbers that
decide which of gather/kernel/bin to attack.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from garden_tpu.core import math3d as m3
from garden_tpu.render import csm as csm_mod
from garden_tpu.render import mesh as rmesh
from garden_tpu.render import raster
from garden_tpu.systems.camera import common_constants

TRACE_DIR = "/tmp/jtrace_csm"
N = 10240
W, H = 1920, 1080


def build_casters():
    """Flagship caster set: tri_world (T,3,3), tri_valid, shadow config,
    camera constants — the exact inputs deferred.py hands render_cascades."""
    from garden_tpu.core.config import RenderConfig, ShadowConfig

    n_dyn = N - 1
    side = max(int(round(n_dyn ** (1.0 / 3.0))), 1)
    cube_mesh = rmesh.cube(0.45)
    ground = rmesh.plane_grid(max(side * 2.0, 20.0), 4)
    rcfg = RenderConfig(
        width=W, height=H, tile_size=128,
        max_vertices=n_dyn * cube_mesh.vertex_count + ground.vertex_count,
        max_triangles=n_dyn * cube_mesh.triangle_count + ground.triangle_count,
        max_tris_per_tile=512, max_instances=n_dyn + 1,
        shadow=ShadowConfig(resolve_step=2,
                            cascade_sizes=(2048, 1024, 1024),
                            atlas_tile_h=16, atlas_foot_y=2,
                            max_active_tiles=(None if "--dense" in sys.argv
                                              else 768)),
        tile_h=32, foot_y=2)
    sc = rmesh.SceneBuffers(rcfg.max_vertices, rcfg.max_triangles,
                            rcfg.max_instances)
    mat = sc.add_material(rmesh.Material(base_color=(0.8, 0.3, 0.2)))
    sc.add_instance(ground, material=mat)
    for _ in range(n_dyn):
        sc.add_instance(cube_mesh, material=mat)
    from garden_tpu.render.deferred import DeferredRenderer
    ren = DeferredRenderer(rcfg, sc)
    scene = ren.device_scene()

    # pile pose: same grid as entry()
    pos = [np.zeros(3)]
    count = 0
    for iy in range(n_dyn // (side * side) + 2):
        for iz in range(side):
            for ix in range(side):
                if count >= n_dyn:
                    break
                pos.append(np.array([ix * 1.05 - side / 2, 0.5 + iy * 1.05,
                                     iz * 1.05 - side / 2]))
                count += 1
    pos = jnp.asarray(np.stack(pos), jnp.float32)
    quat = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n_dyn + 1, 1))
    inst = m3.compose_trs(pos, quat, jnp.ones((n_dyn + 1, 3)))
    inst = inst.at[0].set(jnp.eye(4))

    eye = jnp.array([0.0, side * 0.9 + 4.0, side * 1.6 + 8.0])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, W / H, 0.1)
    constants = common_constants(eye, view, proj,
                                 jnp.array([0.4, -0.7, -0.5]),
                                 (W, H), 0.0, 1.0 / 60.0)
    tri_world, _ = rmesh.transform_triangles(scene, inst)
    return scene, rcfg, tri_world, constants


def main():
    scene, rcfg, tri_world, constants = build_casters()
    scfg = rcfg.shadow
    near = 0.1
    splits = csm_mod.cascade_splits(scfg, near)
    light = csm_mod.fit_cascades(constants["inv_view_proj"],
                                 constants["light_dir"], near, splits, near)
    light = jax.tree_util.tree_map(jax.block_until_ready, light)
    tri_valid = scene["tri_valid"]

    if "--diag" in sys.argv:
        # occupancy: run setup+bin eagerly, report tile/big statistics
        sizes, offsets, aw, ah = csm_mod.cascade_layout(scfg)
        ls = m3.apply_mat4(light["view"],
                           tri_world.reshape(-1, 3)).reshape(-1, 3, 3)
        lx, ly, lz = (jnp.transpose(ls[..., i]) for i in range(3))
        st = csm_mod._setup_cascades(lx, ly, lz, tri_valid, sizes, offsets,
                                     light["projs"])
        th = scfg.atlas_tile_h or 128
        cap = max(64, (256 * th // 128) // 16 * 16)
        fy = scfg.atlas_foot_y or max(2, min(8, 256 // th))
        tiles, counts, big = raster.bin_triangles(st, aw, ah, 128, cap,
                                                  foot=2, tile_h=th, foot_y=fy)
        counts = np.asarray(counts)
        big = np.asarray(big)
        valid = np.asarray(st["valid"])
        print(f"atlas {aw}x{ah}, tiles {counts.size} (128x{th}), cap {cap}")
        print(f"valid casters per cascade: "
              f"{valid.reshape(3, -1).sum(axis=1)}")
        print(f"non-empty tiles: {(counts > 0).sum()} / {counts.size}")
        print(f"sum counts {counts.sum()}, max {counts.max()}, "
              f"p99 {np.percentile(counts, 99):.0f}")
        print(f"overflow tiles (count==cap): {(counts >= cap).sum()}")
        print(f"big-list entries: {(big >= 0).sum()} / {big.size}")
        hist = np.bincount(np.minimum(counts, cap) // 8, minlength=cap // 8 + 1)
        print("count/8 histogram:", hist[:12], "...")
        return

    def run(tw, salt):
        tw = tw + salt * 1e-6
        depth_atlas, _ = csm_mod.render_cascades(
            None, scene["indices"], tri_valid, light, scfg,
            tri_world=tw)
        return depth_atlas

    jrun = jax.jit(run)
    out = jrun(tri_world, jnp.float32(0.0))
    jax.block_until_ready(out)
    import time
    t0 = time.perf_counter()
    iters = 10
    for i in range(iters):
        out = jrun(tri_world, jnp.float32(1.0 + i))
    jax.block_until_ready(out)
    print(f"render_cascades wall: "
          f"{(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(2):
        out = jrun(tri_world, jnp.float32(100.0 + i))
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as rtd
    f = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))[-1:]
    data, _ = rtd.xspace_to_tool_data(f, "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    tot = 0.0
    print(f"{'op':<62s} {'n':>3s} {'avg_ms':>8s} {'GB/s':>7s}")
    for r in rows[:20]:
        c = [x["v"] for x in r["c"]]
        print(f"{c[3][:62]:<62s} {int(c[4]):>3d} {c[6]/1000:>8.3f} {c[15]:>7.1f}")
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] == "Device":
            tot += c[7]
    print(f"device total: {tot/2000:.2f} ms/pass")


if __name__ == "__main__":
    main()
