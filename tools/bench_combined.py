"""Hunt the combined-step overhead: time full-step variants with passes
toggled to find where the extra cost (vs sum of individually-jitted passes)
lives."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import __graft_entry__ as ge
from garden_tpu.core.config import RenderConfig


def time_step(name, **cfg_overrides):
    import dataclasses
    orig = RenderConfig
    step, state = ge._build(n_bodies=10240, width=1920, height=1080,
                            grid_dim=64, cfg_overrides=cfg_overrides)
    jstep = jax.jit(step, donate_argnums=0)
    s, img = jstep(state)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(20):
        s, img = jstep(s)
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{name:<40s} {ms:8.2f} ms ({1e3/ms:6.1f} fps)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cases = {
        "all-on": {},
        "no-shadows": dict(use_shadows=False),
        "no-hbao": dict(use_hbao=False),
        "no-atmosphere": dict(use_atmosphere=False),
        "no-post": dict(use_bloom=False, use_auto_exposure=False,
                        use_fxaa=False),
        "shadows-only-off-rest-on": dict(use_shadows=False),
        "minimal": dict(use_shadows=False, use_hbao=False,
                        use_atmosphere=False, use_bloom=False,
                        use_auto_exposure=False, use_fxaa=False),
    }
    if which == "all":
        for name, o in cases.items():
            time_step(name, **o)
    else:
        time_step(which, **cases[which])
