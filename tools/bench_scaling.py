"""Scaling characterization: world-batch + split-frame rendering (SFR).

VERDICT r4 item 8: turn the two multi-device scaling paths from "tested"
into "characterized" — one script that reports
  (a) worlds/s vs device count for the many-world data-parallel path
      (parallel/worlds.py, SURVEY.md section 5.8 north-star config 5), and
  (b) ms/frame vs band count for split-frame rendering
      (parallel/frame_tiles.py).

Runs on whatever devices exist: the 8-device virtual CPU mesh in CI (set
by default below — absolute times are meaningless there but the SCALING
SHAPE is the product), or real chips when a multi-chip TPU is attached.
Results go to stdout as a JSON line per point; paste the table into
ARCHITECTURE.md when re-measured.

Usage: python tools/bench_scaling.py [--devices 8] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--worlds-per-device", type=int, default=4)
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (cpu = virtual mesh; tpu on real "
                         "multi-chip hosts)")
    args = ap.parse_args()

    # Platform selection mirrors tests/conftest.py: the axon plugin's
    # sitecustomize force-sets jax_platforms at interpreter start
    # (overriding the JAX_PLATFORMS env var), so the ONLY working override
    # is jax.config.update AFTER import but BEFORE anything touches the
    # backend — in particular no jax.default_backend()/jax.devices()
    # queries may happen first (they finalize backend selection; the
    # previous version of this script did exactly that and silently ran
    # single-device). XLA_FLAGS is read lazily at backend init, so setting
    # it here still takes effect.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    devices = jax.devices()
    print(f"# backend={jax.default_backend()} devices={len(devices)}",
          flush=True)

    from garden_tpu.core.config import PhysicsConfig, RenderConfig, ShadowConfig
    from garden_tpu.parallel.worlds import WorldBatch
    from garden_tpu.physics import world as pw

    # -- (a) world-batch scaling: tiny worlds, many of them ----------------
    def build_world(n=64):
        cfg = PhysicsConfig(max_bodies=n, grid_dim=8)
        w = pw.PhysicsWorld(cfg)
        w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
        box = w.shapes.box((0.45, 0.45, 0.45))
        for i in range(n - 1):
            w.add_body(box, position=((i % 4) * 1.05, 0.5 + (i // 16) * 1.05,
                                      ((i // 4) % 4) * 1.05))
        return w, cfg

    results = []
    d = 1
    while d <= len(devices):
        w, cfg = build_world()
        types = w.shapes.present_types()
        n_worlds = args.worlds_per_device * d
        wb = WorldBatch(lambda s: pw.step(s, cfg, 1.0 / 60.0, types),
                        n_worlds, devices=devices[:d])
        batched = wb.replicate(
            w.device_state(),
            vary_fn=lambda s, i: dict(
                s, bodies=dict(s["bodies"], pos=s["bodies"]["pos"]
                               + i.astype(jnp.float32) * 1e-4)))
        batched = wb.step(batched)          # compile + warm
        jax.block_until_ready(batched)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            batched = wb.step(batched)
        jax.block_until_ready(batched)
        dt = time.perf_counter() - t0
        wps = n_worlds * args.steps / dt
        results.append({"path": "world_batch", "devices": d,
                        "worlds": n_worlds,
                        "worlds_per_sec": round(wps, 1)})
        print(json.dumps(results[-1]), flush=True)
        d *= 2

    # -- (b) split-frame rendering: bands of one small frame ---------------
    from garden_tpu.parallel.frame_tiles import FrameTiles
    from garden_tpu.render import mesh as rmesh
    from garden_tpu.core import math3d as m3
    from garden_tpu.systems.camera import common_constants

    width, height = 256, 128
    cube = rmesh.cube(0.45)
    scene = rmesh.SceneBuffers(
        max_vertices=cube.vertex_count * 8 + 64,
        max_triangles=cube.triangle_count * 8 + 64, max_instances=16)
    mat = scene.add_material(rmesh.Material(base_color=(0.8, 0.3, 0.2)))
    ground = rmesh.plane_grid(20.0, 2)
    scene.add_instance(ground, material=mat)
    for i in range(8):
        scene.add_instance(cube, material=mat)
    # instance matrices sized to max_instances (the renderer's contract)
    inst = jnp.stack([jnp.eye(4)] * 16)
    inst = inst.at[1:9, 1, 3].set(jnp.arange(8, dtype=jnp.float32) % 3 + 0.5)
    inst = inst.at[1:9, 0, 3].set(jnp.arange(8, dtype=jnp.float32) - 4.0)
    eye = jnp.array([0.0, 3.0, 8.0])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, width / height, 0.1)
    constants = common_constants(eye, view, proj,
                                 jnp.array([0.4, -0.7, -0.5]),
                                 (width, height), 0.0, 1.0 / 60.0)

    b = 1
    while b <= min(len(devices), height // 8):
        cfg = RenderConfig(
            width=width, height=height, tile_size=128,
            max_vertices=scene.max_vertices,
            max_triangles=scene.max_triangles, max_instances=16,
            shadow=ShadowConfig(map_size=128, resolve_step=1),
            use_clouds=False)
        try:
            ft = FrameTiles(cfg, scene, n_bands=b, overlap=8,
                            devices=devices[:b])
        except ValueError as e:
            print(f"# bands={b}: {e}", flush=True)
            b *= 2
            continue
        dscene = ft.renderer.device_scene()
        fstate = ft.initial_state()
        img, fstate = ft.render(dscene, inst, constants, fstate)  # compile
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            img, fstate = ft.render(dscene, inst, constants, fstate)
        jax.block_until_ready(img)
        dt = time.perf_counter() - t0
        results.append({"path": "split_frame", "bands": b,
                        "ms_per_frame": round(dt / args.steps * 1e3, 2)})
        print(json.dumps(results[-1]), flush=True)
        b *= 2


if __name__ == "__main__":
    main()
