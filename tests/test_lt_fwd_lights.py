"""LT forward-sampling completeness: sky / spot / cylinder paths agree
with PT (ref LightSampleForward clight.h:1064 covers all types; round-1
only covered area/sphere/point — ADVICE.md item 2)."""
import numpy as np
import pytest

from hydracore_tpu.integrators.lt import render_lt
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.lights import LIGHT_CYLINDER, LIGHT_SPOT
from hydracore_tpu.scene.procedural import SceneBuilder


def _compare(sc, spp=160, lt_passes=40, mult=8, thresh=0.15):
    pt = np.asarray(render(sc, spp=spp, seed=5))
    lt = np.asarray(render_lt(sc, n_passes=lt_passes,
                              paths_per_pass=sc.camera.width
                              * sc.camera.height * mult, seed=9))
    emit_mask = pt.max(axis=-1) > 1.2  # exclude directly-seen emitters
    pt_m = np.where(emit_mask[..., None], 0, pt)
    lt_m = np.where(emit_mask[..., None], 0, lt)
    rel = abs(pt_m.mean() - lt_m.mean()) / max(pt_m.mean(), 1e-9)
    assert rel < thresh, \
        f"LT/PT disagree: pt={pt_m.mean():.4f} lt={lt_m.mean():.4f} rel={rel:.3f}"


def test_lt_sky(monkeypatch):
    """Open-top box lit only by the sky: LT must carry env photons in."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    h = 2.0
    b.add_rect([0, -h, 0], [h, 0, 0], [0, 0, h], m)          # floor
    b.add_rect([0, 0, -h], [h, 0, 0], [0, h, 0], m)          # back
    b.add_rect([-h, 0, 0], [0, 0, h], [0, h, 0], m)          # left
    b.add_rect([h, 0, 0], [0, h, 0], [0, 0, h], m)           # right
    b.sky([1.5, 1.5, 1.5])
    sc = b.build(cam_pos=[0, 0.5, 5.0], cam_lookat=[0, -1.0, 0],
                 width=16, height=16, trace_depth=4)
    _compare(sc, thresh=0.18)


def test_lt_spot():
    """Closed box lit by a spot: cone sampling + smoothstep falloff."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_light(
        ltype=LIGHT_SPOT,
        pos=np.array([0, 1.8, 0], np.float32),
        norm=np.array([0, -1, 0], np.float32),
        intensity=np.array([8.0, 8.0, 8.0], np.float32),
        cos_in=np.float32(np.cos(np.radians(25.0))),
        cos_out=np.float32(np.cos(np.radians(45.0))),
    )
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                 width=16, height=16, trace_depth=4)
    _compare(sc)


def test_lt_cylinder():
    """Closed box lit by a cylinder area light."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.cylinder_light([0, 1.0, 0], half_height=0.8, radius=0.15,
                     radiance=[4.0, 4.0, 4.0])
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                 width=16, height=16, trace_depth=4)
    _compare(sc)
