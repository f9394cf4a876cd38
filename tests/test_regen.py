"""Regenerating-wavefront PT (pt_regen) vs the pass-loop integrator.

The two schedules consume the SAME (pixel, pass) sample set through the
same counter-RNG streams, so their images must agree to accumulation-order
rounding."""
import numpy as np

from hydracore_tpu.integrators.pt import render_passes
from hydracore_tpu.integrators.pt_regen import regen_supported, render_passes_regen
from hydracore_tpu.scene.procedural import SceneBuilder


def _scene():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.55, 0.5])
    red = b.lambert([0.7, 0.1, 0.1])
    mirror = b.add_material(refl_color=np.array([0.85, 0.85, 0.85], np.float32))
    b.add_box_interior(2.0, m, m, m, red, m)
    b.add_sphere([-0.6, -1.2, 0.2], 0.7, mirror, n_seg=12, n_ring=6)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [13.0] * 3)
    return b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=16,
                   height=16, trace_depth=5)


def test_regen_matches_pass_loop():
    import jax.numpy as jnp

    sc = _scene()
    assert regen_supported(sc)
    n_pass, md = 6, 5
    fb_a, rays_a = render_passes(sc, jnp.uint32(3), jnp.uint32(77),
                                 n_pass=n_pass, max_depth=md)
    fb_b, rays_b = render_passes_regen(sc, jnp.uint32(3), jnp.uint32(77),
                                       n_pass=n_pass, max_depth=md)
    a, b = np.asarray(fb_a), np.asarray(fb_b)
    # identical sample set -> per-pixel agreement to fp re-association
    assert np.allclose(a, b, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b).max():.3e}"
    # ray counts agree too (same paths, both count eye + shadow rays)
    assert abs(float(rays_a) - float(rays_b)) / max(float(rays_a), 1) < 0.02


def test_regen_matches_pass_loop_sky_alpha():
    """Env-MIS misses and stochastic alpha pass-through follow the same
    schedule-independent streams."""
    import jax.numpy as jnp

    from hydracore_tpu.scene.scene import finalize_scene
    from hydracore_tpu.scene.textures import TextureStorage

    b = SceneBuilder()
    m = b.lambert([0.65, 0.6, 0.55])
    b.add_rect([0, -1.0, 0], [3, 0, 0], [0, 0, 3], m, flip=True)
    storage = TextureStorage()
    otex = np.zeros((1, 1, 4), np.float32)
    otex[..., 0] = 0.45
    oslot = storage.add(otex, gamma=1.0)
    occm = b.add_material(diff_color=np.full(3, 0.3, np.float32),
                          opacity_tex=oslot)
    b.add_rect([0, 0.3, 0], [1.2, 0, 0], [0, 0, 1.2], occm, flip=True)
    sky_img = np.ones((8, 16, 4), np.float32)
    sky_img[:, :8, :3] = 0.2
    b.sky([0.5, 0.55, 0.6], img=sky_img)
    b.rect_light([0, 2.2, 0], 0.5, 0.5, [9.0] * 3)
    sc = b.build(cam_pos=[0, 1.8, 4.0], cam_lookat=[0, -0.5, 0], width=12,
                 height=12, trace_depth=4)
    texels, table, samplers = storage.finalize()
    sc = finalize_scene(sc.replace(texels=texels, tex_table=table,
                                   tex_sampler=samplers))
    assert regen_supported(sc)

    fb_a, _ = render_passes(sc, jnp.uint32(1), jnp.uint32(5), n_pass=4,
                            max_depth=4)
    fb_b, _ = render_passes_regen(sc, jnp.uint32(1), jnp.uint32(5), n_pass=4,
                                  max_depth=4)
    a, b_ = np.asarray(fb_a), np.asarray(fb_b)
    assert np.allclose(a, b_, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b_).max():.3e}"


def test_regen_matches_pass_loop_fog_glass():
    """The per-lane fog state machine follows the same streams as the
    pass loop's."""
    import jax.numpy as jnp

    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    glass = b.add_material(transp_color=np.array([0.9, 0.9, 0.9], np.float32),
                           transp_gloss=1.0, transp_ior=1.5,
                           fog_color=np.array([0.85, 0.4, 0.4], np.float32),
                           fog_mult=np.float32(2.0))
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([0, 0, 0.8], 0.7, glass, n_seg=10, n_ring=5)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [10.0] * 3)
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=10,
                 height=10, trace_depth=5)
    assert sc.settings.has_fog and regen_supported(sc)
    fb_a, _ = render_passes(sc, jnp.uint32(0), jnp.uint32(9), n_pass=4,
                            max_depth=5)
    fb_b, _ = render_passes_regen(sc, jnp.uint32(0), jnp.uint32(9), n_pass=4,
                                  max_depth=5)
    a, b_ = np.asarray(fb_a), np.asarray(fb_b)
    assert np.allclose(a, b_, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b_).max():.3e}"


def test_regen_matches_pass_loop_sss():
    """The SSS medium walk (scatter events consume a wavefront step)
    follows the same streams as the pass loop's."""
    import jax.numpy as jnp

    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    sss = b.add_material(diff_color=np.full(3, 0.4, np.float32),
                         sss_transmission=np.float32(0.7),
                         sss_density=np.float32(1.5),
                         sss_scattering=np.float32(1.0),
                         sss_absorption=np.array([0.2, 0.4, 0.4], np.float32),
                         sss_phase=np.float32(0.3))
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([0, -0.8, 0.5], 0.8, sss, n_seg=10, n_ring=5)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [11.0] * 3)
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=10,
                 height=10, trace_depth=5)
    assert sc.settings.has_sss and regen_supported(sc)
    fb_a, _ = render_passes(sc, jnp.uint32(2), jnp.uint32(11), n_pass=4,
                            max_depth=5)
    fb_b, _ = render_passes_regen(sc, jnp.uint32(2), jnp.uint32(11), n_pass=4,
                                  max_depth=5)
    a, b_ = np.asarray(fb_a), np.asarray(fb_b)
    assert np.allclose(a, b_, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b_).max():.3e}"


def _instanced_scene():
    """A small instanced scene: routes to the cluster backend even on CPU
    (scene.cl_map), turning sorted_mode ON."""
    import xml.etree.ElementTree as ET

    from hydracore_tpu.scene.scene import assemble
    from hydracore_tpu.scene.statefile import (CameraDesc, InstanceDesc,
                                               RenderSettings, SceneDesc)
    from tests.test_instancing import _box_mesh, _mat, _plane_mesh, _xform

    lights = {
        0: ET.fromstring(
            '<light id="0" type="sky" shape="sky" distribution="uniform">'
            '<intensity><color val="0.6 0.7 0.9"/>'
            '<multiplier val="1"/></intensity></light>')
    }
    cam = CameraDesc()
    cam.position = np.array([0, 4, 14], np.float32)
    cam.look_at = np.array([0, 0, 0], np.float32)
    instances = [InstanceDesc(mesh_id=1, matrix=_xform(0, -1.0, 0))]
    for tx, tz, s, ry in [(-3, -2, 1.0, 0.3), (0, 0, 0.7, 1.1),
                          (3, -1, 1.3, 2.0)]:
        instances.append(InstanceDesc(mesh_id=2,
                                      matrix=_xform(tx, 0.0, tz, s, ry)))
    desc = SceneDesc(
        lib_dir="", textures={}, materials={0: _mat(0, "0.7 0.3 0.2"),
                                            1: _mat(1, "0.5 0.5 0.5")},
        lights=lights, camera=cam,
        settings=RenderSettings(width=20, height=20, trace_depth=3),
        meshes={1: _plane_mesh(), 2: _box_mesh()},
        mesh_light_id={}, instances=instances, light_instances=[])
    sc = assemble(desc, instancing="force")
    assert sc.cl_map is not None
    return sc


def test_regen_matches_pass_loop_instanced_sorted():
    """The regen loop's death splat and the whole lane state must ride the
    per-iteration coherence permute (regression test for the pre-permute
    `was` mask)."""
    import jax.numpy as jnp

    sc = _instanced_scene()
    assert regen_supported(sc)
    fb_a, _ = render_passes(sc, jnp.uint32(0), jnp.uint32(7), n_pass=4,
                            max_depth=3)
    fb_b, _ = render_passes_regen(sc, jnp.uint32(0), jnp.uint32(7), n_pass=4,
                                  max_depth=3)
    a, b_ = np.asarray(fb_a), np.asarray(fb_b)
    assert np.allclose(a, b_, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b_).max():.3e}"
