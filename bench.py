"""Headline benchmark: physics steps/sec at 10K rigid bodies (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implicit target of 60 Hz fixed-step simulation at
10K bodies (physics.hpp:679-684 capacity, 60 Hz at physics.hpp:796).
"""

import json
import time

import jax

# persistent compiled-program cache: the step program compiles slowly through
# the axon remote-compile tunnel; the cache makes repeat runs instant
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from garden_tpu.core.config import PhysicsConfig
from garden_tpu.physics import world as pw

BASELINE_HZ = 60.0


def build_world(n: int = 10240) -> tuple:
    cfg = PhysicsConfig(max_bodies=n, grid_dim=64, cell_size=2.0,
                        max_contacts_per_body=16, solver_iterations=10)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0.0, 1.0, 0.0), 0.0), motion=pw.STATIC)
    box = w.shapes.box((0.45, 0.45, 0.45))
    sph = w.shapes.sphere(0.45)
    count = 0
    side = 22
    for ix in range(side):
        for iz in range(side):
            for iy in range(side):
                if count >= n - 1:
                    break
                w.add_body(box if count % 2 == 0 else sph,
                           position=(ix * 1.05 - side / 2, 0.5 + iy * 1.05,
                                     iz * 1.05 - side / 2),
                           friction=0.5)
                count += 1
    return w, cfg, count


def main() -> None:
    w, cfg, count = build_world()
    state = w.device_state()
    types = w.shapes.present_types()
    stepf = jax.jit(lambda s: pw.step(s, cfg, 1.0 / 60.0, types),
                    donate_argnums=0)
    state = stepf(state)
    jax.block_until_ready(state)

    steps = 120
    t0 = time.perf_counter()
    for _ in range(steps):
        state = stepf(state)
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0

    hz = steps / dt
    pos = np.asarray(state["bodies"]["pos"])
    assert np.isfinite(pos).all(), "non-finite body positions"
    print(json.dumps({
        "metric": f"physics steps/sec, {count} rigid bodies, 1 chip",
        "value": round(hz, 2),
        "unit": "steps/s",
        "vs_baseline": round(hz / BASELINE_HZ, 3),
    }))


if __name__ == "__main__":
    main()
