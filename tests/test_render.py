import dataclasses

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import mesh as rmesh
from garden_tpu.render import tonemap
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.systems.camera import common_constants


def small_config():
    return RenderConfig(width=160, height=96, tile_size=32,
                        max_triangles=2048, max_vertices=2048,
                        max_tris_per_tile=128, max_instances=8,
                        use_fxaa=False, use_bloom=False)


def build_scene():
    scene = rmesh.SceneBuffers(2048, 2048, 8)
    red = scene.add_material(rmesh.Material(base_color=(0.9, 0.1, 0.1)))
    grey = scene.add_material(rmesh.Material(base_color=(0.5, 0.5, 0.5),
                                             roughness=0.9))
    glow = scene.add_material(rmesh.Material(base_color=(0.1, 0.1, 0.1),
                                             emissive=(4.0, 3.0, 0.5)))
    scene.add_instance(rmesh.cube(0.5), material=red)
    scene.add_instance(rmesh.plane_grid(20.0, 8), material=grey)
    scene.add_instance(rmesh.uv_sphere(0.4, 8, 12), material=glow)
    return scene


def make_constants(cfg):
    eye = jnp.array([0.0, 1.5, 4.0])
    view = m3.look_at(eye, jnp.array([0.0, 0.5, 0.0]), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, cfg.width / cfg.height, 0.1)
    return common_constants(eye, view, proj, jnp.array([0.3, -0.8, -0.4]),
                            (cfg.width, cfg.height), 0.0, 1.0 / 60.0)


def test_deferred_frame_end_to_end():
    cfg = small_config()
    scene = build_scene()
    renderer = DeferredRenderer(cfg, scene)
    dev = renderer.device_scene()
    constants = make_constants(cfg)

    mats = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    mats[0][1, 3] = 0.5          # cube sits on the ground
    mats[2][:3, 3] = [1.5, 0.4, 0.0]  # emissive sphere to the right

    out = renderer.render(dev, jnp.asarray(mats), constants,
                          renderer.initial_frame_state())
    img = np.asarray(out["image"])
    assert img.shape == (cfg.height, cfg.width, 3) and img.dtype == np.uint8

    h, w = cfg.height, cfg.width
    center = img[h // 2, w // 2].astype(int)
    sky = img[2, w // 2].astype(int)
    # cube is red-ish: r channel dominates
    assert center[0] > center[2] + 10, center
    # sky is blue-ish and bright
    assert sky[2] > sky[0], sky
    # some pixels covered by geometry
    covered = np.asarray(out["tri_id"]) >= 0
    assert 0.2 < covered.mean() <= 1.0
    # depth: ground closer at the bottom of the frame than cube center? just sanity
    assert np.isfinite(np.asarray(out["hdr"])).all()
    # exposure state updated
    assert float(out["frame_state"]["avg_luminance"]) > 0


def test_tonemap_curves():
    x = jnp.linspace(0.0, 8.0, 64)
    for curve in (tonemap.aces, tonemap.uchimura):
        y = np.asarray(curve(x))
        assert (np.diff(y) >= -1e-4).all()     # monotone
        assert y.min() >= 0.0 and y.max() <= 1.0
    assert float(tonemap.aces(jnp.float32(0.0))) == 0.0


def test_histogram_and_adaptation():
    hdr = jnp.ones((32, 32, 3)) * 0.5
    hist = tonemap.luminance_histogram(hdr, 64)
    # histogram meters a 4x-downsampled luminance plane
    assert float(jnp.sum(hist)) == (32 // 4) * (32 // 4)
    avg = tonemap.average_luminance_from_histogram(hist)
    assert 0.3 < float(avg) < 0.8
    # adaptation moves toward the target
    a = tonemap.adapt_exposure(jnp.float32(0.1), jnp.float32(0.5), jnp.float32(0.1))
    assert 0.1 < float(a) < 0.5
