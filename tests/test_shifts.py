"""Shifter (pad-once shifted reads) equivalence vs naive per-tap pads."""

import jax.numpy as jnp
import numpy as np
import pytest

from garden_tpu.ops import blur as B
from garden_tpu.ops.shifts import Shifter


def naive_shift(x, dy, dx):
    """out[y, x] = img[clamp(y + dy), clamp(x + dx)] via per-tap edge pad."""
    pad = [(max(-dy, 0), max(dy, 0)), (max(-dx, 0), max(dx, 0))]
    pad += [(0, 0)] * (x.ndim - 2)
    p = jnp.pad(x, pad, mode="edge")
    h, w = x.shape[0], x.shape[1]
    return p[max(dy, 0):max(dy, 0) + h, max(dx, 0):max(dx, 0) + w]


def test_shifter_matches_naive_edge_pad():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((13, 17, 3), np.float32))
    at = Shifter(img, 4, 6)
    for dy, dx in [(0, 0), (3, -6), (-4, 2), (4, 6), (-4, -6), (1, 0)]:
        assert jnp.allclose(at(dy, dx), naive_shift(img, dy, dx)), (dy, dx)


def test_shifter_rejects_out_of_radius_taps():
    img = jnp.zeros((8, 8))
    at = Shifter(img, 2, 2)
    with pytest.raises(AssertionError):
        at(3, 0)


def test_gaussian_blur_matches_dense_2d_kernel():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((19, 23, 3), np.float32))
    out = B.gaussian_blur(x, radius=2)
    k = B.gaussian_kernel(2)
    ref = jnp.zeros_like(x)
    for i, wy in enumerate(k):
        for j, wx in enumerate(k):
            ref = ref + naive_shift(x, -(i - 2), -(j - 2)) * wy * wx
    assert jnp.allclose(out, ref, atol=1e-5)


def test_box_blur_matches_neighborhood_mean():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((11, 9), np.float32))
    out = B.box_blur(x, radius=1)
    ref = jnp.zeros_like(x)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ref = ref + naive_shift(x, dy, dx)
    assert jnp.allclose(out, ref / 9.0, atol=1e-5)
