"""SBDPT / IBPT estimator consistency against PT.

Strategy coverage mirrors the reference's bidirectional validation: the
same scene rendered through independent estimators must agree
(GPUOCLLayerAdvanced.cpp EvalSBDPT vs PT; the CPU integrator zoo serves
this role in the reference)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators import bdpt
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def _cornell(width=16, mirror=False):
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    red = b.lambert([0.7, 0.15, 0.1])
    left = b.add_material(refl_color=np.array([0.85, 0.85, 0.85], np.float32)) \
        if mirror else red
    b.add_box_interior(2.0, m, m, m, left, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [10.0, 10.0, 10.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=width, height=width, trace_depth=3)


def _block_rel(a, c, n=4):
    w = a.shape[0] // n
    ab = a.reshape(n, w, n, w, 3).mean(axis=(1, 3))
    cb = c.reshape(n, w, n, w, 3).mean(axis=(1, 3))
    mask = ab.mean(-1) > 0.05
    return np.abs(ab - cb).mean(-1)[mask] / np.maximum(ab.mean(-1)[mask], 1e-9)


@pytest.fixture(scope="module")
def diffuse_refs():
    sc = _cornell()
    pt = np.asarray(render(sc, spp=128, seed=3))
    return sc, pt


def test_bdpt_matches_pt_diffuse(diffuse_refs):
    sc, pt = diffuse_refs
    bd = np.asarray(bdpt.render_bdpt(sc, n_passes=64, seed=5))
    rel = abs(bd.mean() - pt.mean()) / pt.mean()
    assert rel < 0.08, f"pt={pt.mean():.4f} bdpt={bd.mean():.4f}"
    assert np.median(_block_rel(pt, bd)) < 0.1


def test_ibpt_matches_pt_diffuse(diffuse_refs):
    sc, pt = diffuse_refs
    ib = np.asarray(bdpt.render_ibpt(sc, n_passes=64, seed=9))
    rel = abs(ib.mean() - pt.mean()) / pt.mean()
    assert rel < 0.08, f"pt={pt.mean():.4f} ibpt={ib.mean():.4f}"
    assert np.median(_block_rel(pt, ib)) < 0.1


def test_bdpt_specular_chain():
    """Mirror wall: delta vertices must flow through the MIS bookkeeping
    (connections at them forbidden, implicit strategies keep weight)."""
    sc = _cornell(mirror=True)
    pt = np.asarray(render(sc, spp=128, seed=3))
    bd = np.asarray(bdpt.render_bdpt(sc, n_passes=64, seed=5))
    rel = abs(bd.mean() - pt.mean()) / pt.mean()
    assert rel < 0.12, f"pt={pt.mean():.4f} bdpt={bd.mean():.4f}"
    assert np.median(_block_rel(pt, bd)) < 0.15
