"""PBR BRDF: GGX/Smith/Schlick, matching the reference's shading model.

Rebuild of shaders/common/brdf.gsl + pbr.gsl (the Filament-style model the
reference uses for its deferred lighting resolve,
source/system/render/pbr-lighting.cpp): GGX normal distribution,
height-correlated Smith visibility, Schlick Fresnel, Lambert diffuse, F0
from reflectance/metallic.
"""

from __future__ import annotations

import jax.numpy as jnp

from garden_tpu.core import math3d as m3

Array = jnp.ndarray


def d_ggx(noh: Array, roughness: Array) -> Array:
    a = roughness * roughness
    a2 = a * a
    f = noh * noh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * f * f, 1e-9)


def v_smith_ggx_correlated(nov: Array, nol: Array, roughness: Array) -> Array:
    a = roughness * roughness
    a2 = a * a
    lv = nol * jnp.sqrt(jnp.maximum(nov * nov * (1.0 - a2) + a2, 1e-9))
    ll = nov * jnp.sqrt(jnp.maximum(nol * nol * (1.0 - a2) + a2, 1e-9))
    return 0.5 / jnp.maximum(lv + ll, 1e-9)


def f_schlick(voh: Array, f0: Array, f90: Array = None) -> Array:
    if f90 is None:
        f90 = jnp.ones_like(f0[..., :1]) if f0.ndim > voh.ndim else jnp.ones_like(f0)
    p = jnp.power(jnp.clip(1.0 - voh, 0.0, 1.0), 5.0)
    if f0.ndim > voh.ndim:
        p = p[..., None]
    return f0 + (f90 - f0) * p


def f0_from_material(base_color: Array, metallic: Array, reflectance: Array) -> Array:
    """Dielectric F0 from 'reflectance' (Filament convention, as in the
    reference's gbuffer encode), metals take base color."""
    dielectric = (0.16 * reflectance * reflectance)[..., None]
    return m3.lerp(
        jnp.broadcast_to(dielectric, base_color.shape), base_color,
        metallic[..., None],
    )


def evaluate(
    normal: Array, view: Array, light: Array,
    base_color: Array, metallic: Array, roughness: Array, reflectance: Array,
) -> Array:
    """Direct BRDF * NoL for one directional light. All (..., 3)/(...,)."""
    n, v, l = normal, view, light
    h = m3.normalize(v + l)
    nov = jnp.maximum(m3.dot(n, v), 1e-4)
    nol = jnp.clip(m3.dot(n, l), 0.0, 1.0)
    noh = jnp.clip(m3.dot(n, h), 0.0, 1.0)
    voh = jnp.clip(m3.dot(v, h), 0.0, 1.0)

    rough = jnp.clip(roughness, 0.045, 1.0)
    f0 = f0_from_material(base_color, metallic, reflectance)

    d = d_ggx(noh, rough)
    vis = v_smith_ggx_correlated(nov, nol, rough)
    f = f_schlick(voh, f0)
    specular = (d * vis)[..., None] * f

    diffuse_color = base_color * (1.0 - metallic[..., None])
    diffuse = diffuse_color / jnp.pi

    return (diffuse + specular) * nol[..., None]


def ambient(
    normal: Array, base_color: Array, metallic: Array,
    sky_color: Array, ground_color: Array, intensity: float = 1.0,
) -> Array:
    """Hemisphere ambient (stand-in for the reference's SH irradiance +
    IBL specular, pbr-lighting.hpp:65; full SH arrives with the atmosphere
    system's sh-generate analog)."""
    up = jnp.clip(normal[..., 1] * 0.5 + 0.5, 0.0, 1.0)[..., None]
    irradiance = m3.lerp(ground_color, sky_color, up) * intensity
    diffuse_color = base_color * (1.0 - metallic[..., None])
    return diffuse_color * irradiance
