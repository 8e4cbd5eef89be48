"""Render one deferred-PBR frame and save it as PNG.

Usage: PYTHONPATH=. python examples/render_demo.py [out.png] [--cpu]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import mesh as rmesh
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.systems.camera import common_constants


def main():
    out_path = next((a for a in sys.argv[1:] if not a.startswith("--")), "frame.png")
    cfg = RenderConfig(width=640, height=384, tile_size=128,
                       max_triangles=8192, max_vertices=8192,
                       max_tris_per_tile=1280, max_instances=16)
    scene = rmesh.SceneBuffers(cfg.max_vertices, cfg.max_triangles,
                               cfg.max_instances, max_textures=2,
                               texture_size=64)
    # checkerboard base-color texture (the ResourceSystem image-load path)
    check = np.zeros((64, 64, 4), np.float32)
    check[..., 3] = 1.0
    cells = (np.add.outer(np.arange(64) // 8,
                          np.arange(64) // 8) % 2).astype(bool)
    check[cells] = (0.9, 0.9, 0.85, 1.0)
    check[~cells] = (0.15, 0.2, 0.5, 1.0)
    tex = scene.add_texture(check)
    red = scene.add_material(rmesh.Material(base_color=(1.0, 1.0, 1.0),
                                            roughness=0.35,
                                            base_texture=tex))
    gold = scene.add_material(rmesh.Material(base_color=(1.0, 0.77, 0.34),
                                             metallic=1.0, roughness=0.3))
    grey = scene.add_material(rmesh.Material(base_color=(0.45, 0.45, 0.48), roughness=0.85))
    glow = scene.add_material(rmesh.Material(base_color=(0.05, 0.05, 0.05),
                                             emissive=(3.0, 1.2, 0.2)))
    scene.add_instance(rmesh.plane_grid(40.0, 16), material=grey)
    scene.add_instance(rmesh.cube(0.5), material=red)
    scene.add_instance(rmesh.uv_sphere(0.5, 16, 32), material=gold)
    scene.add_instance(rmesh.uv_sphere(0.3, 12, 24), material=glow)
    renderer = DeferredRenderer(cfg, scene)
    dev = renderer.device_scene()

    mats = np.tile(np.eye(4, dtype=np.float32), (cfg.max_instances, 1, 1))
    mats[1][:3, 3] = [-1.2, 0.5, 0.0]
    mats[2][:3, 3] = [0.6, 0.5, -0.5]
    mats[3][:3, 3] = [1.8, 0.3, 0.8]

    eye = jnp.array([0.0, 1.8, 4.5])
    view = m3.look_at(eye, jnp.array([0.0, 0.4, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, cfg.width / cfg.height, 0.1)
    constants = common_constants(eye, view, proj, jnp.array([0.4, -0.7, -0.5]),
                                 (cfg.width, cfg.height), 0.0, 1.0 / 60.0)

    render = jax.jit(lambda d, m, c, f: renderer.render(d, m, c, f))
    out = render(dev, jnp.asarray(mats), constants, renderer.initial_frame_state())
    img = np.asarray(out["image"])

    try:
        from PIL import Image
        Image.fromarray(img).save(out_path)
    except ImportError:
        import struct, zlib

        def save_png(path, arr):
            h, w, _ = arr.shape
            raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))
            def chunk(tag, data):
                c = tag + data
                return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))
            png = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(raw))
                   + chunk(b"IEND", b""))
            open(path, "wb").write(png)
        save_png(out_path, img)
    print(f"wrote {out_path} ({img.shape[1]}x{img.shape[0]}), "
          f"covered={float((np.asarray(out['tri_id'])>=0).mean()):.2f}")


if __name__ == "__main__":
    main()
