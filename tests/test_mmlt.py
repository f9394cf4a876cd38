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


def _sds_caustic_scene():
    """Bulb in a glass shell (Veach's classic MLT scene): a small bright
    rect light inside a solid glass sphere. Every NEE shadow ray is
    occluded by the shell, so ALL the room's light is S(refract)S D
    transport that PT only finds by rare BSDF hits on the bulb; MMLT's
    light-subpath strategies (light exits the shell, lands on a wall,
    connects to the eye) + per-depth chains carry it (the reason MMLT
    exists — GPUOCLLayerAdvanced.cpp:518-875, SURVEY §8.7)."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    glass = b.add_material(transp_color=np.array([0.95, 0.95, 0.95],
                                                 np.float32),
                           transp_gloss=1.0, transp_ior=1.5)
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([0, 0.8, 0], 0.5, glass, n_seg=24, n_ring=12)
    b.rect_light([0, 0.8, 0], 0.1, 0.1, [200.0, 200.0, 200.0])
    return b.build(cam_pos=[0.0, 0.0, 5.6], cam_lookat=[0, 0, 0],
                   width=24, height=24, trace_depth=6)


def test_mmlt_beats_pt_on_sds_caustic():
    sc = _sds_caustic_scene()
    # ground truth: long SBDPT run (bidirectional connections sample the
    # shell-transmitted transport well and the estimator family is
    # independently cross-checked)
    from hydracore_tpu.integrators.bdpt import render_bdpt

    ref = np.asarray(render_bdpt(sc, n_passes=192, seed=11, max_depth=6))
    fl = ref.mean(axis=-1)
    assert np.isfinite(fl).all()
    # the lit room: pixels carrying above-median reference energy
    region = fl > max(np.percentile(fl, 50), 1e-6)
    assert region.sum() >= 50

    pt = np.asarray(render(sc, spp=48, seed=3, max_depth=6))
    mm = render_mmlt(sc, n_passes=12, n_chains=24 * 24 * 4,
                     mutations_per_pass=8, seed=7, burn_in=6)
    assert abs(np.asarray(mm).mean() - fl.mean()) / fl.mean() < 0.25
    r = fl[region]
    e_pt = np.abs(pt.mean(axis=-1)[region] - r) / np.maximum(r, 1e-9)
    e_mm = np.abs(np.asarray(mm).mean(axis=-1)[region] - r) / \
        np.maximum(r, 1e-9)
    # MMLT must track the shell-transmitted room light markedly better
    # (measured: mmlt ~0.18 median err vs pt ~1.0 — PT's NEE is blind here)
    assert np.median(e_mm) < 0.5 * np.median(e_pt), \
        f"mmlt med err {np.median(e_mm):.3f} vs pt {np.median(e_pt):.3f}"


def test_mmlt_per_depth_allocation_follows_contribution():
    """Chains are allocated per path depth proportional to the probed b_k
    (MMLTInitSplitDataUniform + the scale table): on the caustic scene the
    deep groups that carry the SSD transport must receive chains."""
    from hydracore_tpu.integrators import mmlt as mmlt_mod

    sc = _sds_caustic_scene()
    alloc = mmlt_mod.probe_depth_alloc(sc, n_chains=24 * 24 * 4, seed=5,
                                       max_depth=6)
    ks = sorted(alloc)
    assert ks[0] >= 2
    total = sum(alloc.values())
    assert total > 0
    deep = sum(v for k, v in alloc.items() if k >= 4)
    assert deep > 0.2 * total, alloc  # SDS needs k>=4; alloc must see it
