"""Regenerate the committed golden curves (tests/golden/data/*.npz).

Run deliberately after an INTENDED solver change, then commit the diff with
a note on what moved and why:

    python -m tests.golden.generate

The analytic cross-checks in test_golden.py still gate the regenerated
curves — a regeneration that breaks physics will not pass.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tests.golden import scenes

DATA = os.path.join(os.path.dirname(__file__), "data")


def main():
    os.makedirs(DATA, exist_ok=True)
    for name in scenes.SCENES:
        curves = scenes.simulate(name)
        path = os.path.join(DATA, f"{name}.npz")
        np.savez_compressed(path, **curves)
        print(f"{name}: {', '.join(sorted(curves))} "
              f"({len(next(iter(curves.values())))} steps) -> {path}")


if __name__ == "__main__":
    main()
