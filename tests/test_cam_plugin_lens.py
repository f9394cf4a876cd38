"""Tabulated-lens camera plugin (cam_plug/CamHostPluginAPI.h:26-70): the
non-trivial HostRaysPlugin the plugin API exists to host. The test_42
statefile ships a 12-surface fisheye table
(<optical_system type="tabular">, statex_00001.xml:96-113)."""
import os

import numpy as np
import pytest

from hydracore_tpu.app.cam_plugin import (SimplePinholePlugin,
                                          TabulatedLensPlugin,
                                          render_with_plugin)
from hydracore_tpu.scene.procedural import SceneBuilder

REF42 = "/root/reference/hydra_app/tests/test_42"

# a symmetric biconvex singlet in SCENE units (meters, like the bundled
# fisheye table): focal ~ R/(2(n-1)) = 25 mm
BICONVEX = [
    dict(curvature_radius=0.026, thickness=0.004, ior=1.52,
         aperture_radius=0.006),
    dict(curvature_radius=-0.026, thickness=0.024, ior=1.0,
         aperture_radius=0.006),
]
FILM_D = 0.024


def _scene(width=16):
    b = SceneBuilder()
    m = b.lambert([0.6] * 3)
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=width,
                   height=width, trace_depth=3)


def test_statefile_optics_parsed():
    if not os.path.exists(REF42):
        pytest.skip("no reference data")
    from hydracore_tpu.scene.statefile import load_statefile

    desc = load_statefile(REF42)
    assert desc.camera.optics is not None
    assert len(desc.camera.optics) == 12
    assert abs(desc.camera.sensor_diagonal - 0.035) < 1e-9
    assert desc.camera.optics[6]["curvature_radius"] == 0.0  # the stop


def test_lens_tracer_refracts_and_vignettes():
    """Rays through the biconvex singlet must converge (viewed from the
    film side) and corner rays must clip on the aperture — behavior a
    pinhole cannot produce."""
    sc = _scene()
    plug = TabulatedLensPlugin(sc, BICONVEX, sensor_diagonal=0.020, seed=7,
                               film_dist=FILM_D)
    o, d, pix = plug.make_rays_block(4096, 0)
    alive = pix >= 0
    assert alive.mean() > 0.3, "lens kills almost every ray"
    assert (~alive).sum() > 0, "no vignetting at all — not a real aperture"
    # refraction bends rays toward the axis: exiting directions must not
    # all equal the film->rear aim direction of a pinhole
    dz = d[alive][:, 2]
    assert np.std(dz) > 1e-4


def test_lens_image_differs_from_pinhole_but_sees_scene():
    sc = _scene(12)
    R = 12 * 12
    pin = SimplePinholePlugin(sc, seed=5)
    render_with_plugin(sc, pin, n_blocks=32, block_size=R)
    img_pin = pin.image()

    lens = TabulatedLensPlugin(sc, BICONVEX, sensor_diagonal=0.022, seed=5,
                               film_dist=FILM_D)
    render_with_plugin(sc, lens, n_blocks=32, block_size=R)
    img_lens = lens.image()

    assert lens.n_dead > 0  # real vignetting happened
    assert img_lens.max() > 0.01, "lens camera sees nothing"
    # the singlet's field of view and vignetting must reshape the image:
    # images are NOT near-identical
    dif = np.abs(img_lens - img_pin).mean()
    assert dif > 0.05 * max(img_pin.mean(), 1e-9)


def test_fisheye_table_traces():
    """The bundled fisheye.10mm table (meters) must pass rays end to end."""
    if not os.path.exists(REF42):
        pytest.skip("no reference data")
    from hydracore_tpu.scene.statefile import load_statefile

    desc = load_statefile(REF42)
    sc = _scene()
    plug = TabulatedLensPlugin(sc, desc.camera.optics,
                               sensor_diagonal=desc.camera.sensor_diagonal,
                               seed=3)
    o, d, pix = plug.make_rays_block(8192, 0)
    alive = pix >= 0
    # a multi-element fisheye passes a minority of film->rear-disk rays;
    # it must pass SOME and the exits must be unit finite directions
    assert alive.sum() > 50, f"only {alive.sum()} rays exit the fisheye"
    nn = np.linalg.norm(d[alive], axis=1)
    assert np.all(np.isfinite(d[alive])) and np.allclose(nn, 1.0, atol=1e-3)
