"""Mesh lights and sky portals (PlainLightConverter.cpp:724 MeshLight,
:304 SkyPortal)."""
import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def _mesh_light_scene(as_mesh: bool):
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    b.add_box_interior(2.0, m, m, m, m, m)
    if as_mesh:
        lid = b.mesh_light([12.0, 12.0, 12.0])
        em = b.emissive([12.0, 12.0, 12.0], light_id=lid)
        b.add_rect([0, 1.95, 0], [0.5, 0, 0], [0, 0, 0.5], em, light=lid)
    else:
        b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=16, height=16, trace_depth=3)


def test_mesh_light_matches_rect_light():
    """The same quad as a mesh light vs a rect light must render the same
    image (same geometry, same radiance, different sampling machinery)."""
    sc_rect = _mesh_light_scene(False)
    sc_mesh = _mesh_light_scene(True)
    a = np.asarray(render(sc_rect, spp=96, seed=3))
    c = np.asarray(render(sc_mesh, spp=96, seed=5))
    rel = abs(a.mean() - c.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.08, f"rect={a.mean():.4f} mesh={c.mean():.4f}"


def test_sky_portal_replaces_sky_nee():
    """Portal-lit box: a room whose only opening carries a portal should
    get its NEE light from the portal (sky excluded from the pick CDF)."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.sky([2.0, 2.0, 2.5])
    from hydracore_tpu.scene.lights import LIGHT_AREA_RECT

    b.add_light(ltype=LIGHT_AREA_RECT, pos=np.array([0, 1.95, 0], np.float32),
                norm=np.array([0, -1, 0], np.float32),
                vx=np.array([0.5, 0, 0], np.float32),
                vy=np.array([0, 0, 0.5], np.float32),
                intensity=np.array([1.0, 1.0, 1.0], np.float32),
                area=1.0, is_portal=1)
    sc = b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                 width=8, height=8, trace_depth=3)
    # sky must have ~zero pick probability
    from hydracore_tpu.scene.lights import LIGHT_SKY

    lt = sc.lights
    sky_row = int(np.argmax(np.asarray(lt.ltype) == LIGHT_SKY))
    p_sky = float(lt.pick_cdf[sky_row + 1] - lt.pick_cdf[sky_row])
    assert p_sky < 0.01
    img = np.asarray(render(sc, spp=32, seed=3))
    assert np.isfinite(img).all() and img.mean() > 0.0
