import dataclasses

import jax.numpy as jnp
import numpy as np

from garden_tpu.core import math3d as m3
from garden_tpu.core.config import RenderConfig
from garden_tpu.render import clouds
from garden_tpu.render import mesh as rmesh
from garden_tpu.render.deferred import DeferredRenderer
from garden_tpu.systems.camera import common_constants


def test_clouds_alpha_and_colors():
    dirs = m3.normalize(jnp.array([
        [0.0, 1.0, 0.0],     # zenith
        [1.0, 0.3, 0.0],     # slanted
        [1.0, -0.2, 0.0],    # below horizon
    ]))
    sun = m3.normalize(jnp.array([0.3, 0.8, 0.2]))
    rgb, alpha = clouds.render_clouds(dirs, sun, coverage=0.7)
    a = np.asarray(alpha)
    assert 0.0 <= a.min() and a.max() <= 1.0
    assert a[2] == 0.0          # nothing below the horizon
    assert a[:2].max() > 0.05   # some cloud visible with high coverage
    assert np.isfinite(np.asarray(rgb)).all()


def test_render_scale_upscales():
    cfg = RenderConfig(width=128, height=64, tile_size=32, max_triangles=256,
                       max_vertices=256, max_tris_per_tile=64, max_instances=2,
                       render_scale=0.5, use_shadows=False, use_hbao=False,
                       use_bloom=False, use_atmosphere=False, use_oit=False)
    scene = rmesh.SceneBuffers(256, 256, 2)
    scene.add_material(rmesh.Material(base_color=(1, 0, 0)))
    scene.add_instance(rmesh.cube(0.5))
    r = DeferredRenderer(cfg, scene)
    eye = jnp.array([0.0, 0.5, 2.5])
    view = m3.look_at(eye, jnp.zeros(3), jnp.array([0.0, 1.0, 0.0]))
    proj = m3.perspective_reverse_z(1.0, 2.0, 0.1)
    c = common_constants(eye, view, proj, jnp.array([0.3, -0.8, -0.4]),
                         (128, 64), 0.0, 1 / 60)
    out = r.render(r.device_scene(), jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
                   c, r.initial_frame_state())
    # output at DISPLAY resolution even though internal was 64x32
    assert out["image"].shape == (64, 128, 3)
    assert out["depth"].shape == (32, 64)  # internal buffers stay scaled
    img = np.asarray(out["image"])
    assert img[32, 64, 0] > img[32, 64, 2]  # cube still red at center


def test_worley_and_cloud_shadow():
    """Worley/Perlin-Worley noises are bounded; the cloud shadow pass
    attenuates ground sunlight under dense coverage (clouds.cpp shadow)."""
    import jax.numpy as jnp
    from garden_tpu.ops import noise
    from garden_tpu.render import clouds

    g = jnp.linspace(0.0, 8.0, 32)
    x, y = jnp.meshgrid(g, g)
    z = jnp.zeros_like(x)
    w = noise.worley3(x, y, z)
    assert float(w.min()) >= 0.0 and float(w.max()) <= 1.0
    assert float(w.std()) > 0.05  # non-degenerate
    pw_ = noise.perlin_worley3(x, y, z)
    assert float(pw_.min()) >= 0.0 and float(pw_.max()) <= 1.0

    pos = jnp.stack([x * 100.0, jnp.zeros_like(x), y * 100.0], axis=-1)
    sun = jnp.array([0.3, 0.8, 0.2])
    t_none = clouds.cloud_shadow(pos, sun, coverage=0.0)
    t_full = clouds.cloud_shadow(pos, sun, coverage=0.9)
    assert float(t_none.min()) > 0.97          # clear sky: no attenuation
    assert float(t_full.mean()) < float(t_none.mean()) - 0.1
    assert float(t_full.min()) >= 0.0
