"""Golden-trajectory regression net (the BASELINE.md fidelity contract —
see tests/golden/README.md for the contract text and tolerance budget).

Two layers per scene:
1. ANALYTIC cross-checks — closed-form physics the trajectory must obey
   regardless of solver flavor (free-fall closed form, restitution apex
   ratios, stack geometry, pendulum energy/period).
2. COMMITTED-CURVE comparison — the full trajectory must match
   tests/golden/data/<scene>.npz within GOLDEN_ATOL. This catches
   unintended solver drift at far tighter resolution than the analytic
   checks; deliberate changes regenerate via `python -m tests.golden.generate`.
"""

import os

import numpy as np
import pytest

from tests.golden import scenes

DATA = os.path.join(os.path.dirname(__file__), "data")

# Committed-curve tolerance: same-platform reruns are bit-identical; this
# absorbs jax/XLA version-to-version reassociation on CPU while still
# catching any real solver change (which moves trajectories by >>1e-3 m).
GOLDEN_ATOL = 2e-3


def _golden(name):
    path = os.path.join(DATA, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden data missing: run python -m tests.golden.generate")
    return dict(np.load(path))


def _compare(name, curves):
    gold = _golden(name)
    assert set(gold) == set(curves), (set(gold), set(curves))
    for k in gold:
        np.testing.assert_allclose(
            curves[k], gold[k], atol=GOLDEN_ATOL,
            err_msg=f"{name}.{k} drifted from the committed golden curve — "
                    "if the solver change is intentional, regenerate via "
                    "python -m tests.golden.generate and document the move")


@pytest.fixture(scope="module")
def all_curves():
    return {name: scenes.simulate(name) for name in scenes.SCENES}


def test_sphere_drop(all_curves):
    c = all_curves["sphere_drop"]
    h, g, y0, r = 1.0 / 60.0, -9.81, 5.0, 0.5
    # analytic: semi-implicit Euler closed form until impact
    # y_k = y0 + g h^2 k(k+1)/2 ; impact when y <= r
    for k in (10, 30, 50):
        expect = y0 + g * h * h * k * (k + 1) / 2
        if expect > r + 0.1:
            np.testing.assert_allclose(c["y"][k - 1], expect, rtol=1e-5)
    # settle: resting height = radius within slop
    assert abs(c["y"][-1] - r) < 0.02, c["y"][-1]
    assert abs(c["vy"][-1]) < 0.05
    _compare("sphere_drop", c)


def test_bounce_apex_sequence(all_curves):
    c = all_curves["bounce_e05"]
    y = c["y"]
    # apex extraction: local maxima after the first impact
    apexes = []
    for i in range(1, len(y) - 1):
        if y[i] > y[i - 1] and y[i] >= y[i + 1] and y[i] > 0.55:
            apexes.append(float(y[i]))
    assert len(apexes) >= 2, apexes
    h0 = 3.0 - 0.5   # drop height above rest
    # restitution law: apex_n ≈ e^(2n) * h0 above rest height. Tolerance
    # budget (README): ±20% on the first apex (discrete-time impact
    # velocity + Baumgarte), ±35% on the second (errors compound).
    a1 = apexes[0] - 0.5
    a2 = apexes[1] - 0.5
    assert 0.8 * 0.25 * h0 < a1 < 1.2 * 0.25 * h0, (a1, 0.25 * h0)
    assert 0.65 * 0.0625 * h0 < a2 < 1.35 * 0.0625 * h0, (a2, 0.0625 * h0)
    _compare("bounce_e05", c)


def test_stack5_settle(all_curves):
    c = all_curves["stack5"]
    # geometry: box i rests at 0.5 + i*1.0, minus accumulated penetration
    # slop. Contract budget: each box within 3 cm of geometric height, the
    # whole stack within 6 cm total compression, lateral drift < 5 cm.
    for i in range(5):
        expect = 0.5 + i * 1.0
        got = float(c[f"y{i}"][-1])
        assert abs(got - expect) < 0.03 + i * 0.01, (i, got, expect)
    assert float(c["x_drift"][-1]) < 0.05, c["x_drift"][-1]
    # stability: no late-time oscillation growth
    tail = np.stack([c[f"y{i}"][-60:] for i in range(5)])
    assert tail.std(axis=1).max() < 5e-3
    _compare("stack5", c)


def test_cradle_velocity_exchange(all_curves):
    c = all_curves["cradle2"]
    # after the elastic head-on impact, velocities EXCHANGE: the striker
    # stops and the target departs at the approach speed (equal masses,
    # e=1). Contract budget: +-5% of the 2 m/s approach speed.
    assert abs(c["vx_a"][-1]) < 0.10, c["vx_a"][-1]
    assert abs(c["vx_b"][-1] - 2.0) < 0.10, c["vx_b"][-1]
    # momentum conserved through the whole trajectory
    np.testing.assert_allclose(c["vx_a"] + c["vx_b"], 2.0, atol=1e-3)
    _compare("cradle2", c)


def test_friction_cone_bracket(all_curves):
    # tan(theta) < mu  ->  static hold: no slip, no residual speed
    hold = all_curves["ramp_hold"]
    assert hold["speed"][-1] < 0.02, hold["speed"][-1]
    assert abs(hold["slip"][-1]) < 0.02, hold["slip"][-1]
    # tan(theta) > mu  ->  steady slide: a = g(sin t - mu cos t) > 0.
    # At +1 deg that's ~0.19 m/s^2 -> ~0.57 m/s after 3 s; assert well
    # clear of the hold case and in the right direction (downhill > 0).
    slide = all_curves["ramp_slide"]
    assert slide["speed"][-1] > 0.2, slide["speed"][-1]
    assert slide["slip"][-1] > 0.1, slide["slip"][-1]
    _compare("ramp_hold", hold)
    _compare("ramp_slide", slide)


def test_pendulum(all_curves):
    c = all_curves["pendulum"]
    x, y, speed = c["x"], c["y"], c["speed"]
    # arm length held: sqrt(x^2 + (y-5)^2) = 1 within 2% once swinging
    arm = np.sqrt(x ** 2 + (y - 5.0) ** 2)
    assert np.all(np.abs(arm[5:] - 1.0) < 0.02), arm.max()
    # energy: speed at bottom crossing ~ sqrt(2 g L) = 4.429 m/s. The
    # exact per-constraint K^-1 solve loses only the O(h) discretization
    # energy (the post-gravity radial component removed each step) —
    # contract budget: within 6% low, 2% high on the FIRST crossing
    # (measured -3.6% at 60 Hz, iteration-count independent).
    cross = np.where(np.sign(x[:-1]) != np.sign(x[1:]))[0]
    assert len(cross) >= 2, "pendulum never crossed bottom"
    v_bottom = speed[cross[0]:cross[0] + 2].max()
    v_exp = np.sqrt(2 * 9.81 * 1.0)
    assert 0.94 * v_exp < v_bottom < 1.02 * v_exp, (v_bottom, v_exp)
    # large-amplitude period: T = 4 sqrt(L/g) K(sin^2(45°)) = 2.368 s ->
    # half period = first-to-second crossing ~ 71 steps at 60 Hz. Budget:
    # ±10%.
    half_T = (cross[1] - cross[0]) / 60.0
    assert 0.90 * 1.184 < half_T < 1.10 * 1.184, half_T
    _compare("pendulum", c)
