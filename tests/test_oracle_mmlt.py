"""OracleMMLT agreement tests (ADVICE r4 medium): the scalar Metropolis
oracle must (a) reproduce the summed per-(s,t) OracleSBDPT strategy images
per depth — pinning the chain machinery (Kelemen mutations, the (1-a)/a
double splat, proportional starts, b_k normalization) against plain MC of
the same target — and (b) pin the jax MMLT (integrators/mmlt.py), whose
chain machinery was previously verified only by aggregate PT agreement.

Reference analogue: the CPU IntegratorMMLT next to the GPU chains
(CPUExp_Integrators.h:842, GPUOCLLayerAdvanced.cpp:395 MMLT_Pass).
"""
import numpy as np
import pytest

from hydracore_tpu.integrators.mmlt import render_mmlt
from hydracore_tpu.integrators.oracle import OracleMMLT, OracleSBDPT
from hydracore_tpu.scene.procedural import SceneBuilder

W = 12


@pytest.fixture(scope="module")
def cornell():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    red = b.lambert([0.7, 0.15, 0.1])
    b.add_box_interior(2.0, m, m, m, red, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [10.0, 10.0, 10.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=W, height=W, trace_depth=3)


def _block(a, n=3):
    w = a.shape[0] // n
    return a.reshape(n, w, n, w, 3).mean(axis=(1, 3))


# strategies with the unsampled (1,1) splat excluded (oracle._weight)
K_STRATS = {2: [(0, 2)], 3: [(0, 3), (1, 2), (2, 1)]}


@pytest.mark.parametrize("k", [2, 3])
def test_oracle_mmlt_matches_strategy_sum(cornell, k):
    omm = OracleMMLT(cornell)
    osb = omm.o
    ref = sum(osb.render_strategy(s, t, spp=24, seed=29 + s + 7 * t)
              for s, t in K_STRATS[k])
    got = omm.render([k], n_chains=24, n_steps=220, n_pool=400, seed=5)
    tot = abs(got.mean() - ref.mean()) / max(ref.mean(), 1e-12)
    assert tot < 0.20, f"k={k} means: strategies {ref.mean():.5f} " \
                       f"metropolis {got.mean():.5f}"
    rb, gb = _block(np.asarray(ref)), _block(got)
    mask = rb.mean(-1) > 0.05 * max(ref.mean(), 1e-9)
    rel = np.abs(rb - gb).mean(-1)[mask] / np.maximum(rb.mean(-1)[mask],
                                                      1e-9)
    assert np.median(rel) < 0.30, \
        f"k={k} median block rel err {np.median(rel):.3f}"


def test_oracle_mmlt_pins_device_mmlt(cornell):
    """Total transport at depths k=2..3: jax chains vs scalar chains."""
    omm = OracleMMLT(cornell)
    ref = omm.render([2, 3], n_chains=24, n_steps=220, n_pool=400, seed=11)
    dev = np.asarray(render_mmlt(cornell, n_passes=20,
                                 n_chains=W * W * 4, mutations_per_pass=8,
                                 seed=7, max_depth=2, burn_in=5))
    tot = abs(dev.mean() - ref.mean()) / max(ref.mean(), 1e-12)
    assert tot < 0.20, f"means: oracle {ref.mean():.5f} device {dev.mean():.5f}"
    rb, gb = _block(np.asarray(ref)), _block(dev)
    mask = rb.mean(-1) > 0.05 * max(ref.mean(), 1e-9)
    rel = np.abs(rb - gb).mean(-1)[mask] / np.maximum(rb.mean(-1)[mask],
                                                      1e-9)
    assert np.median(rel) < 0.30, \
        f"median block rel err {np.median(rel):.3f}"
