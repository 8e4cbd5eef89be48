import dataclasses

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import hiz
from garden_tpu.render import mesh as rmesh
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.render.forward import ForwardRenderer
from garden_tpu.render.sprites import Sprite, SpriteBatch, TextureAtlas
from garden_tpu.systems.camera import common_constants


def _camera(w, h):
    eye = jnp.array([0.0, 0.5, 3.0])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, w / h, 0.1)
    return common_constants(eye, view, proj, jnp.array([0.3, -0.8, -0.4]),
                            (w, h), 0.0, 1 / 60)


def test_hiz_pyramid_and_occlusion():
    # a wall at 2m (reverse-Z depth 0.05) covering the left half of screen
    depth = jnp.zeros((64, 128)).at[:, :64].set(0.05)
    pyr = hiz.build_pyramid(depth, levels=4)
    assert len(pyr) == 4 and pyr[1].shape == (32, 64)
    # reverse-Z min-pyramid: covered region keeps 0.05 where fully covered
    assert abs(float(pyr[1][0, 0]) - 0.05) < 1e-6 and float(pyr[1][0, 40]) == 0.0

    c = _camera(128, 64)
    # full pyramid (default): covers any screen rect
    full = hiz.build_pyramid(depth)
    assert full[-1].shape == (1, 1)
    # box behind the wall (farther => smaller reverse-Z depth), on the left
    aabb_min = jnp.array([[-2.0, -0.5, -8.0]])
    aabb_max = jnp.array([[-0.5, 0.5, -7.0]])
    occ = hiz.occlusion_cull(aabb_min, aabb_max, c["view_proj"], full, 128, 64)
    assert bool(occ[0])
    # the shallow 4-level pyramid cannot cover this rect's footprint:
    # the conservative fallback must refuse to cull
    occ_shallow = hiz.occlusion_cull(aabb_min, aabb_max, c["view_proj"],
                                     pyr, 128, 64)
    assert not bool(occ_shallow[0])
    # box in front of the wall: not occluded
    aabb_min2 = jnp.array([[-1.0, -0.2, 1.5]])
    aabb_max2 = jnp.array([[-0.2, 0.2, 2.0]])
    occ2 = hiz.occlusion_cull(aabb_min2, aabb_max2, c["view_proj"], full, 128, 64)
    assert not bool(occ2[0])


def test_forward_renderer():
    cfg = RenderConfig(width=128, height=128, tile_size=128, max_triangles=256,
                       max_vertices=256, max_tris_per_tile=64, max_instances=2)
    scene = rmesh.SceneBuffers(256, 256, 2)
    scene.add_material(rmesh.Material(base_color=(0.2, 0.8, 0.2)))
    scene.add_instance(rmesh.cube(0.5))
    r = ForwardRenderer(cfg, scene)
    out = r.render(r.device_scene(), jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
                   _camera(128, 128))
    img = np.asarray(out["image"])
    assert img.shape == (128, 128, 3)
    center = img[64, 64].astype(int)
    assert center[1] > center[0]  # green cube


def test_deferred_with_ui_overlay_and_occlusion_state():
    cfg = RenderConfig(width=128, height=128, tile_size=128, max_triangles=256,
                       max_vertices=256, max_tris_per_tile=64, max_instances=2,
                       use_shadows=False, use_hbao=False, use_bloom=False,
                       use_atmosphere=False, use_oit=False, use_fxaa=False,
                       use_occlusion_culling=True)
    scene = rmesh.SceneBuffers(256, 256, 2)
    scene.add_material(rmesh.Material(base_color=(0.8, 0.2, 0.2)))
    scene.add_instance(rmesh.cube(0.5))
    r = DeferredRenderer(cfg, scene)
    atlas = TextureAtlas(64)
    batch = SpriteBatch(atlas, 8)
    batch.push(Sprite(2, 2, 20, 10, atlas.white, color=(0, 0, 1, 1)))
    c = _camera(128, 128)
    fs = r.initial_frame_state()
    assert "prev_depth" in fs
    out = r.render(r.device_scene(), jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
                   c, fs, ui_atlas=atlas.device(),
                   ui_sprites=batch.device_arrays())
    img = np.asarray(out["image"])
    # UI sprite is solid blue in the corner
    np.testing.assert_array_equal(img[7, 10], [0, 0, 255])
    # frame 1: nothing occluded (empty prev depth) -> cube visible
    assert img[64, 64, 0] > img[64, 64, 2]
    # depth fed forward for next-frame occlusion
    assert out["frame_state"]["prev_depth"].shape == (128, 128)
    # second frame with the fed-forward depth still renders the cube
    # (it is its own occluder candidate but in front of itself -> visible)
    out2 = r.render(r.device_scene(), jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
                    c, out["frame_state"])
    img2 = np.asarray(out2["image"])
    assert img2[64, 64, 0] > img2[64, 64, 2]
