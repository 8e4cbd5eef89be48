"""Measure argsort + the profiler's exact setup+bin path on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=50):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:<34s} {ms:8.3f} ms")
    return out


rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 136, 1_966_080).astype(np.int32))
vals = jnp.asarray(rng.random(1_966_080).astype(np.float32))

timeit("argsort 2M int32", jnp.argsort, keys)
timeit("sort 2M f32", jnp.sort, vals)
timeit("cumsum (123K,135) int32",
       lambda m: jnp.cumsum(m, axis=0),
       jnp.asarray(rng.integers(0, 2, (122880, 135)).astype(np.int32)))

# scatter 2M into (136, 576)
idx_t = jnp.asarray(rng.integers(0, 136, 1_966_080).astype(np.int32))
idx_s = jnp.asarray(rng.integers(0, 576, 1_966_080).astype(np.int32))
v = jnp.asarray(rng.integers(0, 122880, 1_966_080).astype(np.int32))
timeit("scatter 2M -> (136,576)",
       lambda t, s, v: jnp.full((137, 576), -1, jnp.int32).at[t, s].set(v, mode="drop"),
       idx_t, idx_s, v)
timeit("gather 2M from 16.6M",
       lambda f, i: jnp.take(f, i),
       jnp.asarray(rng.random(122880 * 135).astype(np.float32)),
       jnp.asarray(rng.integers(0, 122880 * 135, 1_966_080).astype(np.int32)))
