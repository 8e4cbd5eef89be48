"""PBR lighting resolve: the deferred fullscreen lighting pass.

Rebuild of PbrLightingSystem's HdrRender resolve (include/garden/system/
render/pbr-lighting.hpp:92, source/system/render/pbr-lighting.cpp): one
directional light (the CommonConstants light dir, constants.hpp:26-56) with
CSM shadowing and AO, plus ambient (hemisphere now, SH/IBL with the
atmosphere system), emissive, and a procedural sky background for misses.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from garden_tpu.core import math3d as m3
from garden_tpu.render import brdf

Array = jnp.ndarray


def sky_color(view_dir: Array, light_dir: Array) -> Array:
    """Cheap analytic sky (full Hillaire atmosphere in render/atmosphere.py).

    view_dir: (..., 3) direction from camera into the scene."""
    up = jnp.clip(view_dir[..., 1], -1.0, 1.0)
    horizon = jnp.exp(-jnp.abs(up) * 3.0)
    zenith = jnp.clip(up, 0.0, 1.0)
    base = (
        jnp.array([0.20, 0.35, 0.65]) * (1.0 - horizon)[..., None]
        + jnp.array([0.65, 0.75, 0.85]) * horizon[..., None]
    )
    base = base * (0.3 + 0.7 * jnp.clip(light_dir[1], 0.0, 1.0))
    # sun disk + glow
    cos_sun = m3.dot(view_dir, light_dir)
    glow = jnp.power(jnp.clip(cos_sun, 0.0, 1.0), 64.0) * 0.5
    disk = jnp.where(cos_sun > 0.9997, 40.0, 0.0)
    sun = (glow + disk)[..., None] * jnp.array([1.0, 0.95, 0.85])
    ground = jnp.array([0.08, 0.07, 0.06]) * jnp.ones_like(base)
    sky = base + sun
    return jnp.where((up < 0.0)[..., None], ground, sky) * (0.5 + zenith[..., None])


def view_rays(g: Dict[str, Array], constants: Dict[str, Array]) -> Array:
    """Per-pixel world-space ray directions from the inverse projection.

    Unrolled per-component (see gbuffer.reconstruct_position): the einsum
    form forces channel-minor dot_general layouts + 33 MB copies."""
    h, w = g["depth"].shape
    cam = constants["camera_pos"]
    x = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0)[None, :]
    y = (1.0 - (jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0)[:, None]
    m = constants["inv_view_proj"]
    # clip = (x, y, 0.5, 1): z folds into the constant term
    comps = [m[i, 0] * x + m[i, 1] * y + (m[i, 2] * 0.5 + m[i, 3])
             for i in range(4)]
    inv_w4 = 1.0 / jnp.maximum(comps[3], 1e-9)
    world = jnp.stack([comps[0] * inv_w4, comps[1] * inv_w4,
                       comps[2] * inv_w4], axis=-1)
    return m3.normalize(world - cam)


def resolve(
    g: Dict[str, Array],
    constants: Dict[str, Array],
    sun_intensity: float = 4.0,
    shadow: Optional[Array] = None,     # (H, W) or (H, W, 3), 1 = lit
    ao: Optional[Array] = None,         # (H, W)
    ambient_intensity: float = 0.35,
    ambient_sh: Optional[Array] = None,  # (9, 3) sky SH radiance
    sky: Optional[Array] = None,         # (H, W, 3) physical sky radiance
    specular_ambient: Optional[Array] = None,  # (H, W, 3) env reflection
    reflection: Optional[Array] = None,  # (H, W, 3) SSR radiance
    reflection_conf: Optional[Array] = None,   # (H, W) SSR confidence
    gi: Optional[Array] = None,          # (H, W, 3) diffuse GI irradiance
) -> Array:
    """G-buffer + constants -> HDR radiance (H, W, 3).

    Without atmosphere inputs, falls back to the analytic `sky_color` and a
    hemisphere ambient. With `ambient_sh`/`sky` (from render/atmosphere.py)
    this matches the reference's PbrLighting SH-irradiance + IBL path."""
    cam = constants["camera_pos"]
    # light_dir in constants points from the sun toward the scene; shading
    # uses the direction toward the light
    l = -constants["light_dir"]
    view_vec = cam - g["position"]
    v = m3.normalize(view_vec)

    direct = brdf.evaluate(
        g["normal"], v, jnp.broadcast_to(l, g["normal"].shape),
        g["base_color"], g["metallic"], g["roughness"], g["reflectance"],
    ) * sun_intensity
    if shadow is not None:
        if shadow.ndim == 2:
            shadow = shadow[..., None]
        direct = direct * shadow

    if ambient_sh is not None:
        from garden_tpu.render import atmosphere as atm
        irradiance = atm.sh_irradiance(g["normal"], ambient_sh)
        diffuse_color = g["base_color"] * (1.0 - g["metallic"][..., None])
        if gi is not None:
            # diffuse GI buffer input (pbr-lighting.hpp:92 GI buffer):
            # adds bounced irradiance on top of the sky SH
            irradiance = irradiance + gi
        amb = diffuse_color * irradiance
    else:
        sky_up = jnp.array([0.45, 0.55, 0.70]) * ambient_intensity
        ground_dn = jnp.array([0.12, 0.10, 0.08]) * ambient_intensity
        amb = brdf.ambient(g["normal"], g["base_color"], g["metallic"],
                           sky_up, ground_dn)
        if gi is not None:
            amb = amb + g["base_color"] \
                * (1.0 - g["metallic"][..., None]) * gi
    if specular_ambient is not None or reflection is not None:
        # split-sum IBL: env radiance x analytic DFG (the dfgLUT +
        # ibl-specular weighting, pbr-lighting.hpp:65 / render/ibl.py).
        # SSR (the reflection buffer, pbr-lighting.hpp:92) replaces the
        # env radiance where its confidence says the screen has the answer.
        from garden_tpu.render import ibl
        nov = jnp.maximum(m3.dot(g["normal"], v), 1e-4)
        f0 = brdf.f0_from_material(g["base_color"], g["metallic"],
                                   g["reflectance"])
        env = specular_ambient
        if reflection is not None:
            conf = (reflection_conf[..., None]
                    if reflection_conf is not None else 1.0)
            env = (reflection * conf if env is None
                   else env * (1.0 - conf) + reflection * conf)
        amb = amb + env * ibl.specular_env_brdf(f0, nov, g["roughness"])
    if ao is not None:
        amb = amb * ao[..., None]

    radiance = direct + amb + g["emissive"]

    if sky is None:
        dirs = view_rays(g, constants)
        sky = sky_color(dirs, l)

    return jnp.where(g["visible"][..., None], radiance, sky)
