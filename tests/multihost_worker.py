"""Worker process for the multi-host DCN smoke test (launched by
test_parallel.py::test_multihost_dcn_smoke, one process per 'host').

Initializes jax.distributed over a localhost coordinator (the DCN path of
SURVEY.md section 5.8 — multi-host world batching via jax.distributed),
builds a global 2-device CPU mesh spanning both processes, shards a batch
of 4 physics worlds across it, runs 3 jitted steps, and checks a
cross-host psum-reduced metric plus local-shard integrity.
"""

import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garden_tpu.core.config import PhysicsConfig
from garden_tpu.physics import world as pw

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

cfg = PhysicsConfig(max_bodies=16, grid_dim=8, cell_size=2.0)
w = pw.PhysicsWorld(cfg)
w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
w.add_body(w.shapes.sphere(0.5), position=(0.0, 3.0, 0.0))
types = w.shapes.present_types()
state = w.device_state()

mesh = Mesh(np.array(jax.devices()), axis_names=("worlds",))
shard = NamedSharding(mesh, P("worlds"))

N_WORLDS = 4


def make_global(x):
    x = np.asarray(x)
    full = np.broadcast_to(x, (N_WORLDS,) + x.shape).copy()
    # decorrelate worlds so the cross-host reduction is non-trivial
    if full.ndim >= 2 and full.shape[1:] == (16, 3):
        for i in range(N_WORLDS):
            full[i, 1, 0] += 0.01 * i
    return jax.make_array_from_callback(
        (N_WORLDS,) + x.shape, shard, lambda idx: full[idx])


gstate = jax.tree_util.tree_map(make_global, state)

step = jax.jit(jax.vmap(lambda s: pw.step(s, cfg, 1.0 / 60.0, types)),
               in_shardings=(shard,), out_shardings=shard,
               donate_argnums=0)
for _ in range(3):
    gstate = step(gstate)

# cross-host metric reduction over DCN: mean height of the dropped sphere
mean_y = jax.jit(
    lambda s: jnp.mean(s["bodies"]["pos"][:, 1, 1]),
    in_shardings=(shard,), out_shardings=NamedSharding(mesh, P()),
)(gstate)
val = float(mean_y)
assert 2.5 < val < 3.0, val   # fell ~3 steps of gravity from y=3

# local shard sanity
local = [np.asarray(s.data) for s in gstate["bodies"]["pos"].addressable_shards]
assert all(np.isfinite(a).all() for a in local)
print(f"proc {proc_id}: OK mean_y={val:.4f}")
