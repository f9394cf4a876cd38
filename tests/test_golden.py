"""Golden-image regression gate (tests_main analogue, MSE < 50).

Regenerate goldens after INTENTIONAL image changes with:
    python tests/regen_golden.py

Scope: the goldens are SELF-RENDERED (this renderer, pinned at a known-good
commit), so this gate catches regressions, not absolute error — the
reference renderer cannot run in this environment to produce parity images.
Absolute correctness is carried by the independent scalar oracles
(tests/test_oracle*.py: PT family, LT, per-(s,t) SBDPT) and the physics
invariant tests (test_integrator_physics.py: furnace, reciprocity,
white-wall energy), which cross-check the same shared jax library the
golden renders go through.
"""
import os

import numpy as np
import pytest

from tests.golden_scenes import ALL_GOLDEN, render_golden

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("name", sorted(ALL_GOLDEN))
def test_golden_mse(name):
    path = os.path.join(GOLD_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden missing: run tests/regen_golden.py ({path})")
    ref = np.load(path)["ldr"].astype(np.float32)
    img = render_golden(name)
    mse = float(np.mean((img - ref) ** 2))
    # reference gate: mse < 50 on the 0..255 scale (main_app_tests.cpp:149)
    assert mse < 50.0, f"{name}: MSE {mse:.2f} vs golden"
