"""PSSMLT vs PT consistency: Metropolis and plain PT estimate the same
image (the reference validates MLT against its PT core the same way)."""
import numpy as np
import pytest

from hydracore_tpu.integrators.mlt import render_mlt
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def test_mlt_matches_pt():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    red = b.lambert([0.7, 0.15, 0.1])
    b.add_box_interior(2.0, m, m, m, red, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [10.0, 10.0, 10.0])
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0], width=16, height=16, trace_depth=3)

    pt = np.asarray(render(sc, spp=128, seed=3))
    mlt = render_mlt(sc, n_passes=30, n_chains=16 * 16 * 6,
                     mutations_per_pass=8, seed=7, burn_in=6)

    # global brightness agreement
    rel = abs(pt.mean() - mlt.mean()) / max(pt.mean(), 1e-9)
    assert rel < 0.15, f"MLT/PT brightness mismatch: pt={pt.mean():.4f} mlt={mlt.mean():.4f}"
    # coarse spatial agreement (4x4 blocks)
    a = pt.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    c = mlt.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    mask = a.mean(-1) > 0.05
    relmap = np.abs(a - c).mean(-1)[mask] / np.maximum(a.mean(-1)[mask], 1e-9)
    assert np.median(relmap) < 0.15, f"median block error {np.median(relmap):.3f}"
