"""Honest full-frame trace at the north-star workload: runs the combined
step with evolving inputs under the jax profiler, then prints the top ops
(ground truth for per-op cost — wall-clock timing of repeated identical
inputs is invalid on this runtime, see ARCHITECTURE.md performance notes)."""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

import __graft_entry__ as ge

TRACE_DIR = "/tmp/jtrace_frame"


def main():
    step, state = ge._build(n_bodies=10240, width=1920, height=1080,
                            grid_dim=64)

    def stepped(s, i):
        b = s["physics"]["bodies"]
        lv = b["linvel"].at[1, 0].add(1e-6 * (1.0 + i))
        s = dict(s, physics=dict(s["physics"], bodies=dict(b, linvel=lv)))
        return step(s)

    jstep = jax.jit(stepped, donate_argnums=0)
    state, img = jstep(state, jnp.float32(0.0))
    jax.block_until_ready(img)
    import time
    t0 = time.perf_counter()
    for i in range(10):
        state, img = jstep(state, jnp.float32(1.0 + i))
    jax.block_until_ready(img)
    print(f"honest combined step: {(time.perf_counter()-t0)/10*1e3:.1f} ms "
          f"({10/(time.perf_counter()-t0):.1f} fps)", flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(2):
        state, img = jstep(state, jnp.float32(100.0 + i))
    jax.block_until_ready(img)
    jax.profiler.stop_trace()

    from xprof.convert import raw_to_tool_data as rtd
    f = sorted(glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.xplane.pb"))[-1:]
    data, _ = rtd.xspace_to_tool_data(f, "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    tot = 0.0
    n_rows = 60 if "--long" in sys.argv else 24
    print(f"{'op':<62s} {'n':>3s} {'avg_ms':>8s} {'GB/s':>7s}")
    for r in rows[:n_rows]:
        c = [x["v"] for x in r["c"]]
        print(f"{c[3][:62]:<62s} {int(c[4]):>3d} {c[6]/1000:>8.3f} {c[15]:>7.1f}")
    # aggregate by leading named scope for a subsystem budget table
    agg = {}
    for r in rows:
        c = [x["v"] for x in r["c"]]
        if c[1] == "Device":
            tot += c[7]
            name = c[3]
            scope = name.split("/")[1] if name.count("/") else name
            agg[scope] = agg.get(scope, 0.0) + c[7]
    print(f"device total: {tot/2000:.2f} ms/frame")
    print("--- by scope (ms/frame) ---")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{k:<40s} {v/2000:>8.3f}")


if __name__ == "__main__":
    main()
