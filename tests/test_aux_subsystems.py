"""Aux subsystem tests: alpha transparency, IES parsing, denoise filters,
multiscatter energy baker."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.bsdf.energy_tables import bake_ggx_albedo
from hydracore_tpu.lights.ies import ies_to_texture, parse_ies
from hydracore_tpu.scene.scene import finalize_scene
from hydracore_tpu.utils.denoise import bilateral_filter, nlm_filter, normalmap_from_height


def test_alpha_transparency_passthrough():
    """A fully transparent quad in front of a lit floor must not darken it;
    a half-transparent one attenuates the view consistently."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder
    from hydracore_tpu.scene.textures import TextureStorage

    def make(op):
        b = SceneBuilder()
        m = b.lambert([0.8, 0.8, 0.8])
        b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)
        # black occluder quad between camera and floor with opacity texture
        storage = TextureStorage()
        tex = np.zeros((1, 1, 4), np.float32)
        tex[..., 0] = op  # opacity read from channel 0
        slot = storage.add(tex)
        occ = b.add_material(diff_color=np.zeros(3, np.float32), opacity_tex=slot)
        b.add_rect([0, 1.0, 0], [3, 0, 0], [0, 0, 3], occ, flip=True)
        b.point_light([0, 2.5, 0], [10.0] * 3)
        sc = b.build(cam_pos=[0, 3, 3], cam_lookat=[0, 0, 0], width=17, height=17, trace_depth=4)
        texels, table, samplers = storage.finalize()
        sc = finalize_scene(sc.replace(texels=texels, tex_table=table,
                                       tex_sampler=samplers))
        return sc

    img_open = np.asarray(render(make(0.0), spp=48, seed=3))
    img_blocked = np.asarray(render(make(1.0), spp=48, seed=3))
    c_open = img_open[8, 8].mean()
    c_blocked = img_blocked[8, 8].mean()
    assert c_open > 0.3, f"transparent quad blocked the view: {c_open}"
    assert c_blocked < 0.05 * max(c_open, 1e-9) + 0.02, f"opaque black quad leaked: {c_blocked}"


def test_shadow_split_matches_legacy_walk(monkeypatch):
    """The split shadow sets (opaque pool + dense alpha set,
    scene._build_shadow_split) must reproduce the legacy layered
    closest-hit walk: same hash streams, same per-layer decisions, so the
    render is identical up to float noise."""
    import jax

    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.ops import trace_api as ta
    from hydracore_tpu.ops import traverse_cluster as tc
    from hydracore_tpu.scene.procedural import SceneBuilder
    from hydracore_tpu.scene.textures import TextureStorage

    b = SceneBuilder()
    m = b.lambert([0.8, 0.8, 0.8])
    b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)
    storage = TextureStorage()
    tex = np.zeros((1, 1, 4), np.float32)
    tex[..., 0] = 0.5
    slot = storage.add(tex)
    occ = b.add_material(diff_color=np.full(3, 0.2, np.float32),
                         opacity_tex=slot)
    b.add_rect([-0.5, 1.0, -0.5], [2, 0, 0], [0, 0, 2], occ, flip=True)
    # opaque blocker covering part of the light
    b.add_rect([0.8, 1.6, 0.8], [1, 0, 0], [0, 0, 1], m, flip=True)
    b.point_light([0, 2.5, 0], [10.0] * 3)
    sc = b.build(cam_pos=[0, 3, 3], cam_lookat=[0, 0, 0], width=17,
                 height=17, trace_depth=3)
    texels, table, samplers = storage.finalize()
    sc = finalize_scene(sc.replace(texels=texels, tex_table=table,
                                       tex_sampler=samplers))
    assert sc.cl_tris_shadow is not None and sc.alpha_tri9f is not None
    assert int((np.asarray(sc.alpha_tri_id) >= 0).sum()) == 2

    img_legacy = np.asarray(render(sc, spp=16, seed=5))

    monkeypatch.setattr(tc, "INTERPRET", True)
    monkeypatch.setattr(ta, "_use_dense", lambda s: False)
    monkeypatch.setattr(ta, "_use_cluster", lambda s: True)
    jax.clear_caches()  # same avals -> force a retrace onto the new pick
    try:
        img_split = np.asarray(render(sc, spp=16, seed=5))
    finally:
        jax.clear_caches()
    assert np.allclose(img_legacy, img_split, atol=5e-3), (
        np.abs(img_legacy - img_split).max())


IES_SAMPLE = """IESNA:LM-63-1995
[TEST] synthetic
TILT=NONE
1 1000.0 1.0 5 1 1 2 0.0 0.0 0.0
1.0 1.0 0.0
0.0 45.0 90.0 135.0 180.0
0.0
1000.0 800.0 300.0 50.0 0.0
"""


def test_ies_parse_and_texture():
    v, h, c = parse_ies(IES_SAMPLE)
    assert len(v) == 5 and len(h) == 1
    assert c.shape == (1, 5)
    tex, peak = ies_to_texture(v, h, c, n_theta=32, n_phi=16)
    assert tex.shape == (32, 16, 4)
    assert peak == pytest.approx(1000.0, rel=0.05)  # grid centers miss theta=0
    # monotonically decreasing profile along theta
    prof = tex[:, 0, 0]
    assert prof[0] > 0.9 and prof[-1] < 0.05
    assert (np.diff(prof) <= 1e-4).all()


def test_denoise_filters_reduce_noise_keep_edges():
    rng = np.random.default_rng(0)
    clean = np.zeros((32, 32, 3), np.float32)
    clean[:, 16:] = 1.0  # step edge
    noisy = clean + rng.normal(0, 0.1, clean.shape).astype(np.float32)
    for f in (lambda x: bilateral_filter(jnp.asarray(x), 2.0, 0.25, 3),
              lambda x: nlm_filter(jnp.asarray(x), h=0.12)):
        out = np.asarray(f(noisy))
        # noise reduced in flat areas
        assert out[4:28, 2:12].std() < noisy[4:28, 2:12].std() * 0.6
        # edge preserved
        assert abs(out[:, 20:28].mean() - out[:, 4:12].mean()) > 0.8


def test_normalmap_from_height():
    H = W = 16
    x = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0) * 0.1  # slope in +x
    n = np.asarray(normalmap_from_height(jnp.asarray(x), amount=1.0))
    inner = n[4:-4, 4:-4]
    assert (inner[..., 0] < -0.05).all()  # slope down +x -> normal tilts -x
    assert (inner[..., 2] > 0.9).all()


def test_ggx_albedo_table_properties():
    E = bake_ggx_albedo(size=8, n_samples=512, seed=2)
    assert E.shape == (8, 8)
    assert (E >= 0).all() and (E <= 1.0).all()
    # smooth surfaces reflect nearly all energy; rough at grazing lose most
    assert E[0, -1] > 0.95  # alpha->0, mu->1
    assert E[-1, 0] < E[0, -1]


def test_transp_albedo_table_properties():
    """64^3 rough-dielectric table analogue of m_essTranspTable
    (cfetch.h:79): smooth glass conserves energy (refl+refr ~ 1), rough
    glass at grazing loses it to multiple scattering."""
    from hydracore_tpu.bsdf.energy_tables import bake_transp_albedo
    E = bake_transp_albedo(size=8, n_samples=512, seed=3)
    assert E.shape == (8, 8, 8)
    assert (E > 0).all() and (E <= 1.0).all()
    # mid ior (~1.4), alpha->0, mu->1: near-total single-scatter energy
    assert E[3, 0, -1] > 0.93
    # rough + grazing loses energy vs smooth + normal at every ior
    assert (E[:, -1, 0] < E[:, 0, -1]).all()


def test_procedural_texture_modulates_diffuse():
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.ops.proctex import checker, clear_registry, register_proc_tex
    from hydracore_tpu.scene.procedural import SceneBuilder

    clear_registry()
    pid = register_proc_tex(checker)
    try:
        b = SceneBuilder()
        m = b.add_material(diff_color=np.array([0.8, 0.8, 0.8], np.float32), diff_proc=pid)
        b.add_rect([0, 0, 0], [5, 0, 0], [0, 0, 5], m, flip=True)
        b.point_light([0, 3.0, 0], [20.0] * 3)
        sc = b.build(cam_pos=[0, 4, 0.01], cam_lookat=[0, 0, 0], width=32, height=32, trace_depth=2)
        img = np.asarray(render(sc, spp=16, seed=2)).mean(-1)
        # checkerboard: bimodal — bright and near-black squares
        assert (img > 0.15).sum() > 100
        assert (img < 0.02).sum() > 100
    finally:
        clear_registry()


def test_production_mode_matches_progressive():
    from hydracore_tpu.integrators.pt import render, render_production
    from hydracore_tpu.scene.procedural import SceneBuilder

    b = SceneBuilder()
    m = b.lambert([0.6] * 3)
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=12, height=12, trace_depth=3)
    a = np.asarray(render(sc, spp=64, seed=3, max_depth=3))
    c = np.asarray(render_production(sc, spp=64, seed=3, max_depth=3, tile_pixels=72))
    emit = a.max(-1) > 4.0
    am = np.where(emit[..., None], 0, a)
    cm = np.where(emit[..., None], 0, c)
    rel = abs(am.mean() - cm.mean()) / max(am.mean(), 1e-9)
    assert rel < 0.1, f"production vs progressive: {am.mean():.4f} vs {cm.mean():.4f}"


def test_cylinder_light_renders():
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.lights import LIGHT_CYLINDER
    from hydracore_tpu.scene.procedural import SceneBuilder

    b = SceneBuilder()
    m = b.lambert([0.7] * 3)
    b.add_rect([0, 0, 0], [4, 0, 0], [0, 0, 4], m, flip=True)
    b.add_light(
        ltype=LIGHT_CYLINDER, pos=np.array([0, 1.5, 0], np.float32),
        norm=np.array([0, 1, 0], np.float32), vx=np.array([0, 0.5, 0], np.float32),
        intensity=np.array([8.0, 8.0, 8.0], np.float32), radius=0.1,
        area=float(2 * np.pi * 0.1 * 1.0),
    )
    sc = b.build(cam_pos=[0, 2.5, 3], cam_lookat=[0, 0, 0], width=16, height=16, trace_depth=2)
    img = np.asarray(render(sc, spp=48, seed=2, max_depth=2))
    assert np.isfinite(img).all()
    assert img.mean() > 0.02  # floor is lit by the cylinder


def test_bump_mapping_perturbs_shading():
    """A bumped floor under a point light shades differently from a flat
    one, and the 014_Bump_height reference scene loads with baked normal
    maps attached."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder
    from hydracore_tpu.scene.textures import TextureStorage, _height_to_normalmap

    rng_ = np.random.default_rng(0)
    height = (np.sin(np.linspace(0, 4 * np.pi, 32))[None, :] * 0.5 + 0.5).repeat(32, 0)
    nmap = _height_to_normalmap(height.astype(np.float32), amount=12.0)
    assert nmap.shape == (32, 32, 4)
    assert abs(nmap[..., 0].mean() - 0.5) < 0.05  # zero-mean slopes

    def scene(bump_slot):
        b = SceneBuilder()
        storage = TextureStorage()
        slot = storage.add(nmap)
        m = b.add_material(diff_color=np.array([0.7] * 3, np.float32),
                           bump_tex=(slot if bump_slot else 0), bump_amount=1.0)
        b.add_rect([0, 0, 0], [3, 0, 0], [0, 0, 3], m, flip=True)
        b.point_light([2, 3, 2], [25.0] * 3)
        sc = b.build(cam_pos=[0, 3.5, 0.01], cam_lookat=[0, 0, 0], width=24, height=24, trace_depth=2)
        texels, table, samplers = storage.finalize()
        return finalize_scene(sc.replace(texels=texels, tex_table=table,
                                         tex_sampler=samplers))

    flat = np.asarray(render(scene(False), spp=48, seed=2, max_depth=2)).mean(-1)
    bumped = np.asarray(render(scene(True), spp=48, seed=2, max_depth=2)).mean(-1)
    # bump visibly changes shading (same seeds -> differences are the bump)
    rel = np.abs(bumped - flat) / np.maximum(flat, 1e-3)
    assert rel.max() > 0.15, f"max rel change {rel.max():.3f}"
    assert np.median(rel) > 0.01
    # and the overall brightness stays in the same ballpark (no energy blowup)
    assert abs(bumped.mean() - flat.mean()) / flat.mean() < 0.5  # strong bump self-shadows


def test_bump_height_reference_scene_loads():
    from hydracore_tpu.scene.scene import load_scene

    sc = load_scene("/root/reference/hydra_app/tests/014_Bump_height", width=32, height=32)
    assert (np.asarray(sc.materials.bump_tex) > 0).any(), "no baked normal maps"


def test_ies_profile_shapes_point_light():
    """A point light with a narrow downward IES profile lights the floor
    below but not the far floor (profile cuts off at 45 deg)."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.lights.ies import ies_to_texture, parse_ies
    from hydracore_tpu.scene.procedural import SceneBuilder
    from hydracore_tpu.scene.textures import TextureStorage

    v, h, c = parse_ies(IES_SAMPLE)  # 1000 at 0deg -> 0 at 180deg
    tex, peak = ies_to_texture(v, h, c, n_theta=32, n_phi=8)

    b = SceneBuilder()
    storage = TextureStorage()
    slot = storage.add(tex)
    m = b.lambert([0.8] * 3)
    b.add_rect([0, 0, 0], [6, 0, 0], [0, 0, 6], m, flip=True)
    lid = b.point_light([0, 1.5, 0], [10.0] * 3)
    b.light_recs[lid]["tex"] = slot
    b.light_recs[lid]["norm"] = np.array([0, -1, 0], np.float32)  # axis down
    sc = b.build(cam_pos=[0, 5, 0.01], cam_lookat=[0, 0, 0], width=33, height=33, trace_depth=2)
    texels, table, samplers = storage.finalize()
    sc = finalize_scene(sc.replace(texels=texels, tex_table=table,
                                       tex_sampler=samplers))

    img = np.asarray(render(sc, spp=24, seed=4, max_depth=2)).mean(-1)
    center = img[14:19, 14:19].mean()  # directly under the light (theta~0)
    edge = img[2:6, 2:6].mean()  # floor far out (theta > 60deg -> profile ~0)
    assert center > 0.2, f"center {center}"
    assert edge < center * 0.2, f"edge {edge} vs center {center}"


def test_cam_plugin_pipeline():
    """Host camera-rays plugin (CamHostPluginAPI analogue): a pinhole
    plugin must reproduce the builtin render."""
    from hydracore_tpu.app.cam_plugin import SimplePinholePlugin, render_with_plugin
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder

    b = SceneBuilder()
    m = b.lambert([0.6] * 3)
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=12,
                 height=12, trace_depth=3)
    R = sc.camera.width * sc.camera.height
    plug = SimplePinholePlugin(sc, seed=5)
    # enough blocks for ~48 spp
    render_with_plugin(sc, plug, n_blocks=48, block_size=R)
    img = plug.image()
    ref = np.asarray(render(sc, spp=48, seed=3))
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9)
    assert rel < 0.1, f"plugin={img.mean():.4f} builtin={ref.mean():.4f}"


def test_proctex_ao_input_channel():
    """Proc-tex AO input (MakeAORays -> surfHit.ao -> readAttr_AO,
    light.cl:274-457 + texproc.cl:56): an ao_dirt shader darkens floor
    points whose 'up' hemisphere is blocked by nearby geometry, and leaves
    open floor untouched."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.ops.proctex import ao_dirt, clear_registry, register_proc_tex
    from hydracore_tpu.scene.procedural import SceneBuilder

    clear_registry()
    pid = register_proc_tex(ao_dirt)
    try:
        def build(ao_on):
            b = SceneBuilder()
            args = np.zeros(8, np.float32)
            args[0:3] = 0.03   # dirt (occluded)
            args[3:6] = 0.75   # clean (open)
            floor = b.add_material(diff_color=np.ones(3, np.float32),
                                   diff_proc=pid, proc_args=args,
                                   ao_type=1 if ao_on else 0, ao_length=1.5)
            b.add_rect([0, 0, 0], [4, 0, 0], [0, 0, 4], floor, flip=True)
            # a vertical wall on the left blocks the up-hemisphere of
            # nearby floor points but not the overhead light path to most
            wall = b.lambert([0.4, 0.4, 0.4])
            b.add_rect([-1.5, 0.75, 0], [0, 0.75, 0], [0, 0, 2], wall)
            b.point_light([2.0, 3.5, 0], [30.0] * 3)
            return b.build(cam_pos=[0.5, 4.0, 0.01], cam_lookat=[0.3, 0, 0],
                           width=24, height=24, trace_depth=2)

        sc_on = build(True)
        sc_off = build(False)
        assert sc_on.settings.has_proc_ao and not sc_off.settings.has_proc_ao
        img_on = np.asarray(render(sc_on, spp=32, seed=2)).mean(-1)
        img_off = np.asarray(render(sc_off, spp=32, seed=2)).mean(-1)
        # with AO off, ao=1 everywhere -> the dirt shader returns 'clean';
        # with AO on, some floor pixels (near the wall) darken strongly
        ratio = img_on / np.maximum(img_off, 1e-6)
        vis = img_off > 0.02
        # a wall blocks at most ~half the up hemisphere: ao ~ 0.5 ->
        # ratio ~ (0.03+0.75)/2/0.75 ~ 0.52 at the closest floor points
        assert (ratio[vis] < 0.65).sum() >= 8, \
            f"no AO darkening: min ratio {ratio[vis].min():.3f}"
        assert ratio[vis].min() < 0.58
        assert np.median(ratio[vis]) > 0.7  # open floor mostly unchanged
    finally:
        clear_registry()
