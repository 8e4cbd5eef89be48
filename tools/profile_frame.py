"""Per-pass frame profiler at the north-star workload (10K bodies, 1080p).

Times each render stage as an independently-jitted function on the real TPU
so the 1080p frame budget can be attacked pass by pass (VERDICT.md round-1
item 2). Each stage is compiled with representative inputs and timed over N
steady-state iterations.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import PhysicsConfig, RenderConfig
from garden_tpu.physics import world as pw
from garden_tpu.render import bloom as bloom_mod
from garden_tpu.render import csm as csm_mod
from garden_tpu.render import fxaa as fxaa_mod
from garden_tpu.render import hbao as hbao_mod
from garden_tpu.render import mesh as rmesh
from garden_tpu.render import oit as oit_mod
from garden_tpu.render import raster, gbuffer, lighting, tonemap
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.systems.camera import common_constants

N_BODIES = 10240
W, H = 1920, 1080
REPS = 20


def timeit(name, fn, *args):
    """Honest timing: the TPU runtime memoizes bit-identical executions, so
    every rep perturbs the first float input leaf by a unique epsilon."""
    import jax.tree_util as jtu

    def perturbed(eps, *a):
        done = [False]

        def bump(x):
            if (not done[0] and hasattr(x, "dtype")
                    and x.dtype == jnp.float32 and x.ndim >= 1):
                done[0] = True
                return x + eps
            return x
        a = jtu.tree_map(bump, a)
        return fn(*a)

    jfn = jax.jit(perturbed)
    out = jfn(jnp.float32(0.0), *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = jfn(jnp.float32((i + 1) * 1e-7), *args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:<34s} {ms:8.2f} ms", flush=True)
    return out


def main():
    import __graft_entry__ as ge
    step, state = ge._build(n_bodies=N_BODIES, width=W, height=H, grid_dim=64)

    # Rebuild the same pieces _build makes, so stages can be timed alone.
    pcfg = PhysicsConfig(max_bodies=N_BODIES, grid_dim=64, cell_size=2.0,
                         max_contacts_per_body=8, solver_iterations=8)
    w = pw.PhysicsWorld(pcfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    box = w.shapes.box((0.45, 0.45, 0.45))
    n_dyn = N_BODIES - 1
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
        max_tris_per_tile=512, max_instances=n_dyn + 1,
    )
    scene_h = rmesh.SceneBuffers(rcfg.max_vertices, rcfg.max_triangles,
                                 rcfg.max_instances)
    mat = scene_h.add_material(rmesh.Material(base_color=(0.8, 0.3, 0.2)))
    gmat = scene_h.add_material(rmesh.Material(base_color=(0.5, 0.5, 0.5)))
    scene_h.add_instance(ground, material=gmat)
    for _ in range(n_dyn):
        scene_h.add_instance(cube_mesh, material=mat)
    renderer = DeferredRenderer(rcfg, scene_h)
    scene = renderer.device_scene()

    eye = jnp.array([0.0, side * 0.9 + 4.0, side * 1.6 + 8.0])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, W / H, 0.1)
    constants = common_constants(eye, view, proj,
                                 jnp.array([0.4, -0.7, -0.5]),
                                 (W, H), 0.0, 1.0 / 60.0)

    pstate = w.device_state()
    types = w.shapes.present_types()

    print(f"== per-pass profile: {N_BODIES} bodies, {W}x{H}, reps={REPS} ==")

    pstate2 = timeit("physics step", lambda s: pw.step(s, pcfg, 1.0 / 60.0, types), pstate)

    pos, quat = pstate2["bodies"]["pos"], pstate2["bodies"]["quat"]

    def inst_fn(pos, quat):
        im = m3.compose_trs(pos[: n_dyn + 1], quat[: n_dyn + 1],
                            jnp.ones((n_dyn + 1, 3)))
        return im.at[0].set(jnp.eye(4))
    inst = timeit("instance matrices", inst_fn, pos, quat)

    def xform(scene, inst):
        wp, wn = rmesh.transform_vertices(scene, inst)
        tv = renderer.cull_instances(scene, inst, constants)
        return wp, wn, tv
    world_pos, world_nrm, tri_valid = timeit("vertex transform + cull", xform, scene, inst)

    translucent = scene["tri_translucent"]

    def setup_bin(wp, tv):
        clip = m3.apply_mat4_h(constants["view_proj"], wp)
        setup = raster.setup_triangles(clip, scene["indices"],
                                       tv & ~translucent, W, H)
        tiles, counts, big = raster.bin_triangles(setup, W, H, rcfg.tile_size,
                                                  rcfg.max_tris_per_tile)
        return setup, tiles, counts, big
    setup, tiles, counts, big = timeit("main setup + bin", setup_bin, world_pos, tri_valid)

    vis = timeit("main raster (visibility)",
                 lambda s, t, c, b: raster.rasterize_visibility(s, t, c, b, W, H, rcfg.tile_size),
                 setup, tiles, counts, big)

    g = timeit("gbuffer shade",
               lambda v, s, wp, wn: gbuffer.shade_gbuffer(v, s, scene, wp, wn, constants=constants),
               vis, setup, world_pos, world_nrm)

    scfg = rcfg.shadow
    near = 0.1
    splits = csm_mod.cascade_splits(scfg, near)

    def shadows(wp, g):
        light = csm_mod.fit_cascades(constants["inv_view_proj"],
                                     constants["light_dir"], near,
                                     splits, near)
        depth_a, trans_a = csm_mod.render_cascades(
            wp, scene["indices"], scene["tri_valid"], light, scfg)
        vd = m3.length(g["position"] - constants["camera_pos"])
        sh = csm_mod.resolve_shadow(g["position"], g["normal"], vd, depth_a,
                                    trans_a, light, scfg, splits,
                                    constants["light_dir"])
        return jnp.where(g["visible"][..., None], sh, 1.0)
    shadow = timeit("CSM (3 cascades + resolve)", shadows, world_pos, g)

    def csm_raster_only(wp):
        light = csm_mod.fit_cascades(constants["inv_view_proj"],
                                     constants["light_dir"], near,
                                     splits, near)
        return csm_mod.render_cascades(wp, scene["indices"],
                                       scene["tri_valid"], light, scfg)
    timeit("  CSM raster only", csm_raster_only, world_pos)

    ao = timeit("HBAO",
                lambda g: hbao_mod.compute_hbao(g["position"], g["normal"],
                                                g["visible"], constants["camera_pos"]),
                g)

    from garden_tpu.render import atmosphere as atm
    to_light = -constants["light_dir"]

    def sky_fn(g):
        rays = lighting.view_rays(g, constants)
        return atm.sky_radiance(rays, to_light)
    sky = timeit("atmosphere sky (background)", sky_fn, g)

    def spec_fn(g):
        refl = m3.reflect(-jnp.broadcast_to(
            m3.normalize(constants["camera_pos"] - g["position"]),
            g["normal"].shape), g["normal"])
        return atm.sky_radiance(refl, to_light, steps=4)
    spec_amb = timeit("atmosphere specular-ambient", spec_fn, g)

    sh_amb = atm.sky_sh(to_light)

    hdr = timeit("lighting resolve",
                 lambda g, sh, ao, sky, sa: lighting.resolve(
                     g, constants, shadow=sh, ao=ao, ambient_sh=sh_amb,
                     sky=sky, specular_ambient=sa),
                 g, shadow, ao, sky, spec_amb)

    def oit_fn(wp, tv, hdr, vis):
        clip = m3.apply_mat4_h(constants["view_proj"], wp)
        tsetup = raster.setup_triangles(clip, scene["indices"],
                                        tv & translucent, W, H)
        ttiles, tcounts, tbig = raster.bin_triangles(tsetup, W, H, rcfg.tile_size,
                                                     rcfg.max_tris_per_tile // 2)
        ttiles, tcounts = raster.merge_big_list(ttiles, tcounts, tbig)
        mat_id = scene["inst_material"][jnp.maximum(scene["tri_instance"], 0)]
        mcols = scene["materials"][mat_id]
        tri_colors = jnp.concatenate(
            [mcols[:, 0:3] * 0.8 + mcols[:, 5:8], mcols[:, 9:10]], axis=-1)
        accum, reveal = oit_mod.rasterize_oit(tsetup, tri_colors, ttiles,
                                              tcounts, vis["depth"], W, H,
                                              rcfg.tile_size)
        return oit_mod.composite(hdr, accum, reveal)
    hdr = timeit("OIT (setup+bin+raster+comp)", oit_fn, world_pos, tri_valid, hdr, vis)

    hdr = timeit("bloom", lambda h: bloom_mod.apply_bloom(h, rcfg.bloom_mip_count), hdr)

    def expose(hdr):
        hist = tonemap.luminance_histogram(hdr, rcfg.exposure_histogram_bins)
        target = tonemap.average_luminance_from_histogram(hist)
        avg = tonemap.adapt_exposure(jnp.float32(0.18), target, constants["delta_time"])
        return tonemap.tone_map(hdr, tonemap.exposure_from_luminance(avg), mode=rcfg.tone_mapper)
    ldr = timeit("auto-exposure + tonemap", expose, hdr)

    timeit("FXAA", fxaa_mod.apply_fxaa, ldr)

    # total end-to-end
    jstep = jax.jit(step)
    out = jstep(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    s = state
    for _ in range(REPS):
        s, img = jstep(s)
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{'TOTAL combined step':<34s} {ms:8.2f} ms  ({1e3 / ms:.1f} fps)")


if __name__ == "__main__":
    main()
