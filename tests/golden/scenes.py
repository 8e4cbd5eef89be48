"""Canonical golden-trajectory scenes (BASELINE.md physics-fidelity net).

Each builder returns (state, cfg, types, track) where `track` maps curve
names to functions of the device state. `simulate` runs the fixed-step
loop (physics.hpp:679-684 step conventions: 60 Hz, velocity Jacobi solve +
position projection) and samples every curve each step.

These four scenes are the agreed fidelity contract (tests/golden/README.md):
1 m-arm sphere drop, e=0.5 bounce apex sequence, 5-box stack settle
heights, and a Point-joint pendulum (physics.hpp:368-373 joint kinds).
"""

from typing import Callable, Dict, Tuple

import jax
import numpy as np

from garden_tpu.core.config import PhysicsConfig
from garden_tpu.physics import constraints as con
from garden_tpu.physics import world as pw


def sphere_drop():
    """r=0.5 sphere dropped from rest at y=5 onto the ground plane.

    Free flight is semi-implicit Euler (closed form checkable); impact and
    settle exercise the contact solver's restitution=0 response."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    w.add_body(w.shapes.sphere(0.5), position=(0.0, 5.0, 0.0))
    track = {
        "y": lambda s: float(s["bodies"]["pos"][1, 1]),
        "vy": lambda s: float(s["bodies"]["linvel"][1, 1]),
    }
    return w.device_state(), cfg, w.shapes.present_types(), track


def bounce_e05():
    """r=0.5 sphere, restitution 0.5, dropped from y=3: apex sequence."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    w.add_body(w.shapes.sphere(0.5), position=(0.0, 3.0, 0.0),
               restitution=0.5)
    track = {
        "y": lambda s: float(s["bodies"]["pos"][1, 1]),
        "vy": lambda s: float(s["bodies"]["linvel"][1, 1]),
    }
    return w.device_state(), cfg, w.shapes.present_types(), track


def stack5():
    """Five 1 m boxes stacked with 1 mm gaps: settle heights + stability.

    The canonical sequential-impulse stress case — this is where Jacobi
    with mass splitting visibly differs from Jolt (see README contract)."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8, solver_iterations=16)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((0, 1, 0), 0.0), motion=pw.STATIC)
    box = w.shapes.box((0.5, 0.5, 0.5))
    for i in range(5):
        w.add_body(box, position=(0.0, 0.501 + i * 1.001, 0.0),
                   friction=0.6)
    track = {
        f"y{i}": (lambda s, i=i: float(s["bodies"]["pos"][1 + i, 1]))
        for i in range(5)
    }
    track["x_drift"] = lambda s: float(
        np.abs(np.asarray(s["bodies"]["pos"][1:6, [0, 2]])).max())
    return w.device_state(), cfg, w.shapes.present_types(), track


def pendulum():
    """Point-joint pendulum: 1 m arm released horizontal.

    Large-amplitude period is analytic (elliptic K); the joint must hold
    arm length while the bob converts height to speed."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8, solver_iterations=10)
    w = pw.PhysicsWorld(cfg)
    anchor = w.add_body(w.shapes.sphere(0.1), position=(0.0, 5.0, 0.0),
                        motion=pw.STATIC)
    bob = w.add_body(w.shapes.sphere(0.2), position=(1.0, 5.0, 0.0))
    table = con.ConstraintTable(8)
    table.point(anchor, bob, (0.0, 5.0, 0.0),
                w._b["pos"][anchor], w._b["quat"][anchor],
                w._b["pos"][bob], w._b["quat"][bob])
    state = w.device_state()
    state["constraints"] = table.device_arrays()
    track = {
        "x": lambda s, bob=bob: float(s["bodies"]["pos"][bob, 0]),
        "y": lambda s, bob=bob: float(s["bodies"]["pos"][bob, 1]),
        "speed": lambda s, bob=bob: float(
            np.linalg.norm(np.asarray(s["bodies"]["linvel"][bob]))),
    }
    return state, cfg, w.shapes.present_types(), track


SCENES: Dict[str, Tuple[Callable, int]] = {
    # name -> (builder, steps)
    "sphere_drop": (sphere_drop, 120),
    "bounce_e05": (bounce_e05, 360),
    "stack5": (stack5, 300),
    "pendulum": (pendulum, 240),
}


def simulate(name: str) -> Dict[str, np.ndarray]:
    """Run a canonical scene; returns {curve: (steps,) float32}."""
    builder, steps = SCENES[name]
    state, cfg, types, track = builder()
    h = 1.0 / cfg.simulation_rate
    stepf = jax.jit(lambda s: pw.step(s, cfg, h, types))
    curves = {k: [] for k in track}
    for _ in range(steps):
        state = stepf(state)
        for k, fn in track.items():
            curves[k].append(fn(state))
    return {k: np.asarray(v, np.float32) for k, v in curves.items()}
