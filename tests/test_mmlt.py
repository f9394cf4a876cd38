"""MMLT (Metropolis over SBDPT, per-depth chains) consistency tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators.mmlt import render_mmlt
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def test_mmlt_matches_pt_diffuse():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    red = b.lambert([0.7, 0.15, 0.1])
    b.add_box_interior(2.0, m, m, m, red, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [10.0, 10.0, 10.0])
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                 width=16, height=16, trace_depth=3)

    pt = np.asarray(render(sc, spp=128, seed=3))
    mm = render_mmlt(sc, n_passes=24, n_chains=16 * 16 * 4,
                     mutations_per_pass=8, seed=7, burn_in=5)

    rel = abs(pt.mean() - mm.mean()) / max(pt.mean(), 1e-9)
    assert rel < 0.15, f"pt={pt.mean():.4f} mmlt={mm.mean():.4f}"
    a = pt.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    c = mm.reshape(4, 4, 4, 4, 3).mean(axis=(1, 3))
    mask = a.mean(-1) > 0.05
    relmap = np.abs(a - c).mean(-1)[mask] / np.maximum(a.mean(-1)[mask], 1e-9)
    assert np.median(relmap) < 0.15, f"median block error {np.median(relmap):.3f}"


def test_mmlt_finds_specular_transport():
    """Mirror-floor caustic: light hits a mirror panel, the reflected spot
    on the wall is specular-diffuse transport PT only finds by luck (no
    NEE through the mirror). MMLT's light-subpath strategies must carry
    nonzero energy there (the reason MMLT exists — SURVEY §8.7)."""
    b = SceneBuilder()
    m = b.lambert([0.5, 0.5, 0.5])
    mirror = b.add_material(refl_color=np.array([0.9, 0.9, 0.9], np.float32))
    b.add_box_interior(2.0, mirror, m, m, m, m)  # mirror floor
    b.rect_light([0, 1.95, 0], 0.3, 0.3, [20.0, 20.0, 20.0])
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                 width=16, height=16, trace_depth=4)
    mm = render_mmlt(sc, n_passes=16, n_chains=16 * 16 * 4,
                     mutations_per_pass=8, seed=7, burn_in=4)
    pt = np.asarray(render(sc, spp=96, seed=3))
    # both estimators see the mirror-bounced energy; MMLT should be in the
    # same brightness regime (factor-2 band) on this SD-heavy scene
    assert mm.mean() > 0.3 * pt.mean()
    assert mm.mean() < 3.0 * pt.mean()
