"""Radiometric correctness tests for the PT integrator against closed-form
results — the TPU build's version of the reference's CPU-oracle strategy
(SURVEY.md §4: the CPU integrator is the executable spec; here analytic
radiometry is the spec and the integrator must reproduce it)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def test_furnace_lambert_sphere():
    """Uniform sky L=1, convex lambert sphere albedo rho: every surface point
    sees the full environment, so outgoing radiance = rho * L exactly.
    Catches NEE+BSDF double counting and cosine/pdf factor mistakes."""
    rho = 0.6
    b = SceneBuilder()
    b.sky([1.0, 1.0, 1.0])
    m = b.lambert([rho, rho, rho])
    b.add_sphere([0, 0, 0], 1.0, m, n_seg=48, n_ring=24)
    sc = b.build(cam_pos=[0, 0, 4], cam_lookat=[0, 0, 0], width=48, height=48, trace_depth=3)

    img = np.asarray(render(sc, spp=96, seed=3))
    # center region (well inside sphere silhouette)
    c = img[18:30, 18:30].mean(axis=(0, 1))
    assert np.allclose(c, rho, atol=0.02), f"furnace radiance {c} != {rho}"
    # background = sky
    edge = img[0, 0]
    assert np.allclose(edge, 1.0, atol=0.02)


def test_point_light_direct_analytic():
    """Point light I over a lambert floor: L = rho/pi * I * cos/d^2."""
    rho = 0.8
    I = 10.0
    b = SceneBuilder()
    m = b.lambert([rho, rho, rho])
    b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)  # floor, n=+y
    b.point_light([0, 2.0, 0], [I, I, I])
    sc = b.build(cam_pos=[0, 3, 3], cam_lookat=[0, 0, 0], width=33, height=33, trace_depth=2)

    img = np.asarray(render(sc, spp=32, seed=1))
    # the camera center pixel sees the floor point directly below the light
    # region around image center maps near origin; expected L there:
    d2 = 4.0
    expected = rho / np.pi * I / d2  # cos=1 directly under the light
    c = img[16, 16]
    assert np.allclose(c, expected, rtol=0.15), f"{c} vs {expected}"


def test_area_light_vs_solid_angle_analytic():
    """Disk-free check: small rect light far away ~ point source.
    L ~ rho/pi * (E) with E = Lr * A * cos_l * cos_s / d^2."""
    rho = 0.5
    Lr = 100.0
    hx = hz = 0.05
    A = 4 * hx * hz
    h = 3.0
    b = SceneBuilder()
    m = b.lambert([rho, rho, rho])
    b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)
    b.rect_light([0, h, 0], hx, hz, [Lr, Lr, Lr])
    sc = b.build(cam_pos=[0, 2, 2], cam_lookat=[0, 0, 0], width=33, height=33, trace_depth=2)
    img = np.asarray(render(sc, spp=64, seed=5))
    expected = rho / np.pi * Lr * A / (h * h)
    c = img[16, 16].mean()
    assert np.isclose(c, expected, rtol=0.2), f"{c} vs {expected}"


def test_mis_two_strategies_agree():
    """The same scene rendered with different seeds must converge to the
    same image (MIS estimator consistency / unbiasedness smoke test)."""
    b = SceneBuilder()
    m = b.lambert([0.7, 0.7, 0.7])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [15.0, 15.0, 15.0])
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=32, height=32, trace_depth=4)

    a = np.asarray(render(sc, spp=160, seed=11))
    c = np.asarray(render(sc, spp=160, seed=97))
    denom = np.maximum(a.mean(), 1e-6)
    rel = np.abs(a.mean(axis=(0, 1)) - c.mean(axis=(0, 1))) / denom
    assert (rel < 0.05).all(), f"seed disagreement {rel}"
    assert a.mean() > 0.05  # actually lit


def test_specular_mirror_reflection():
    """Mirror floor reflects the sky: reflected radiance = tint * sky."""
    from hydracore_tpu.scene.materials import REFL_MIRROR

    b = SceneBuilder()
    b.sky([2.0, 2.0, 2.0])
    m = b.add_material(
        refl_color=np.array([0.9, 0.9, 0.9], np.float32),
        refl_dist=REFL_MIRROR, refl_gloss=1.0,
    )
    b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)
    sc = b.build(cam_pos=[0, 2, 2], cam_lookat=[0, 0, 0], width=32, height=32, trace_depth=3)
    img = np.asarray(render(sc, spp=24, seed=2))
    c = img[16, 16]
    assert np.allclose(c, 0.9 * 2.0, rtol=0.05), f"mirror {c} != 1.8"
