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


def cradle2():
    """Two-sphere Newton's cradle: equal masses, head-on elastic impact.

    Analytic contract (momentum + energy, e=1): the moving sphere STOPS
    and the resting sphere departs at the full approach speed — velocity
    exchange within ±5% (tests/golden/README.md budget). Zero gravity and
    zero friction isolate the restitution impulse path."""
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8, gravity=(0.0, 0.0, 0.0))
    w = pw.PhysicsWorld(cfg)
    a = w.add_body(w.shapes.sphere(0.5), position=(-1.3, 0.0, 0.0),
                   linvel=(2.0, 0.0, 0.0), restitution=1.0, friction=0.0)
    b = w.add_body(w.shapes.sphere(0.5), position=(0.0, 0.0, 0.0),
                   restitution=1.0, friction=0.0)
    track = {
        "vx_a": lambda s, a=a: float(s["bodies"]["linvel"][a, 0]),
        "vx_b": lambda s, b=b: float(s["bodies"]["linvel"][b, 0]),
        "x_a": lambda s, a=a: float(s["bodies"]["pos"][a, 0]),
        "x_b": lambda s, b=b: float(s["bodies"]["pos"][b, 0]),
    }
    return w.device_state(), cfg, w.shapes.present_types(), track


def friction_ramp(theta_deg: float, mu: float = 0.5):
    """1 m box resting on an inclined plane at `theta_deg`.

    Analytic contract (Coulomb cone): the box holds static iff
    tan(theta) < mu — the golden pair brackets the critical angle
    atan(0.5) = 26.57 deg at +-1 deg. The ramp tilts about z, so the
    downhill direction aligns exactly with one solver tangent axis
    (solver._orthonormal_tangents with |n.x| < 0.9 picks t2 in the x-y
    plane): the two-tangent friction box degenerates to the exact
    single-axis Coulomb clamp, making the +-1 deg budget meaningful."""
    th = np.deg2rad(theta_deg)
    s, c = float(np.sin(th)), float(np.cos(th))
    cfg = PhysicsConfig(max_bodies=8, grid_dim=8)
    w = pw.PhysicsWorld(cfg)
    w.add_body(w.shapes.plane((-s, c, 0.0), 0.0), motion=pw.STATIC,
               friction=mu)
    # box face-aligned with the ramp: orientation = Rz(theta)
    half = np.sin(th / 2.0)
    box = w.shapes.box((0.5, 0.5, 0.5))
    bi = w.add_body(box, position=(-0.501 * s, 0.501 * c, 0.0),
                    rotation=(0.0, 0.0, float(half), float(np.cos(th / 2.0))),
                    friction=mu)
    track = {
        "speed": lambda st, bi=bi: float(
            np.linalg.norm(np.asarray(st["bodies"]["linvel"][bi]))),
        "slip": lambda st, bi=bi, s=s, c=c: float(
            -(np.asarray(st["bodies"]["pos"][bi, 0]) + 0.501 * s) * c
            - (np.asarray(st["bodies"]["pos"][bi, 1]) - 0.501 * c) * s),
    }
    return w.device_state(), cfg, w.shapes.present_types(), track


SCENES: Dict[str, Tuple[Callable, int]] = {
    # name -> (builder, steps)
    "sphere_drop": (sphere_drop, 120),
    "bounce_e05": (bounce_e05, 360),
    "stack5": (stack5, 300),
    "pendulum": (pendulum, 240),
    "cradle2": (cradle2, 60),
    # +-1 deg bracket around the critical angle atan(0.5) = 26.57 deg
    "ramp_hold": (lambda: friction_ramp(25.57), 180),
    "ramp_slide": (lambda: friction_ramp(27.57), 180),
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
