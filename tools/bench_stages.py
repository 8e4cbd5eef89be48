"""Bisect the composed-frame cost: cumulative-stage variants of the
north-star combined step, each jitted as one program (like entry())."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import PhysicsConfig, RenderConfig
from garden_tpu.physics import world as pw
from garden_tpu.render import csm as csm_mod
from garden_tpu.render import mesh as rmesh
from garden_tpu.render import raster, gbuffer, lighting
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.systems.camera import common_constants

N = 10240
W, H = 1920, 1080

import __graft_entry__ as ge


def build():
    return ge._build(n_bodies=N, width=W, height=H, grid_dim=64)


def main():
    # rebuild the internals exactly like the profiler
    pcfg = PhysicsConfig(max_bodies=N, grid_dim=64, cell_size=2.0,
                         max_contacts_per_body=8, solver_iterations=8)
    w = pw.PhysicsWorld(pcfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    box = w.shapes.box((0.45, 0.45, 0.45))
    n_dyn = N - 1
    side = max(int(round(n_dyn ** (1.0 / 3.0))), 1)
    count = 0
    for iy in range(n_dyn // (side * side) + 2):
        for iz in range(side):
            for ix in range(side):
                if count >= n_dyn:
                    break
                w.add_body(box, position=(ix * 1.05 - side / 2,
                                          0.5 + iy * 1.05,
                                          iz * 1.05 - side / 2), friction=0.5)
                count += 1
    cube_mesh = rmesh.cube(0.45)
    ground = rmesh.plane_grid(max(side * 2.0, 20.0), 4)
    rcfg = RenderConfig(
        width=W, height=H, tile_size=128,
        max_vertices=n_dyn * cube_mesh.vertex_count + ground.vertex_count,
        max_triangles=n_dyn * cube_mesh.triangle_count + ground.triangle_count,
        max_tris_per_tile=512, max_instances=n_dyn + 1)
    sc = rmesh.SceneBuffers(rcfg.max_vertices, rcfg.max_triangles,
                            rcfg.max_instances)
    mat = sc.add_material(rmesh.Material(base_color=(0.8, 0.3, 0.2)))
    gmat = sc.add_material(rmesh.Material(base_color=(0.5, 0.5, 0.5)))
    sc.add_instance(ground, material=gmat)
    for _ in range(n_dyn):
        sc.add_instance(cube_mesh, material=mat)
    ren = DeferredRenderer(rcfg, sc)
    scene = ren.device_scene()
    eye = jnp.array([0.0, side * 0.9 + 4.0, side * 1.6 + 8.0])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, W / H, 0.1)
    constants = common_constants(eye, view, proj,
                                 jnp.array([0.4, -0.7, -0.5]),
                                 (W, H), 0.0, 1.0 / 60.0)
    pstate = w.device_state()
    types = w.shapes.present_types()
    fs = ren.initial_frame_state()

    def stage_fn(upto):
        def fn(pstate, fs):
            phys = pw.step(pstate, pcfg, 1.0 / 60.0, types)
            pos, quat = phys["bodies"]["pos"], phys["bodies"]["quat"]
            inst = m3.compose_trs(pos[: n_dyn + 1], quat[: n_dyn + 1],
                                  jnp.ones((n_dyn + 1, 3)))
            inst = inst.at[0].set(jnp.eye(4))
            if upto == "physics":
                return phys, inst
            world_pos, world_nrm = rmesh.transform_vertices(scene, inst)
            tri_valid = ren.cull_instances(scene, inst, constants)
            if upto == "xform":
                return phys, world_pos, world_nrm, tri_valid
            translucent = scene["tri_translucent"]
            clip = m3.apply_mat4_h(constants["view_proj"], world_pos)
            setup = raster.setup_triangles(clip, scene["indices"],
                                           tri_valid & ~translucent, W, H)
            tiles, counts, big = raster.bin_triangles(setup, W, H, 128,
                                                      rcfg.max_tris_per_tile)
            if upto == "bin":
                return phys, tiles, counts
            vis = raster.rasterize_visibility(setup, tiles, counts, big,
                                              W, H, 128)
            if upto == "raster":
                return phys, vis
            g = gbuffer.shade_gbuffer(vis, setup, scene, world_pos,
                                      world_nrm, constants=constants)
            if upto == "gbuffer":
                return phys, g
            scfg = rcfg.shadow
            near = 0.1
            splits = csm_mod.cascade_splits(scfg, near)
            light = csm_mod.fit_cascades(constants["inv_view_proj"],
                                         constants["light_dir"], near,
                                         splits, near)
            depth_a, trans_a = csm_mod.render_cascades(
                world_pos, scene["indices"], scene["tri_valid"], light, scfg)
            vd = m3.length(g["position"] - constants["camera_pos"])
            shadow = csm_mod.resolve_shadow(g["position"], g["normal"], vd,
                                            depth_a, trans_a,
                                            light, scfg,
                                            splits, constants["light_dir"])
            shadow = jnp.where(g["visible"][..., None], shadow, 1.0)
            if upto == "shadow":
                return phys, shadow
            out = ren.render(scene, inst, constants, fs)
            return phys, out["image"], out["frame_state"]
        return fn

    for upto in ("physics", "xform", "bin", "raster", "gbuffer", "shadow",
                 "full"):
        jfn = jax.jit(stage_fn(upto))
        out = jfn(pstate, fs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(15):
            out = jfn(pstate, fs)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / 15 * 1e3
        print(f"cumulative through {upto:<10s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
