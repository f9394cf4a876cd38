"""Production wavefront PT vs the independent eager numpy oracle
(SURVEY.md §4.4: CPU reference core as oracle)."""
import numpy as np
import pytest

from hydracore_tpu.integrators.oracle import OracleRenderer
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


def test_wavefront_matches_oracle():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.5, 0.4])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [14.0, 14.0, 14.0])
    sc = b.build(cam_pos=[0, 0, 5.4], cam_lookat=[0, 0, 0], width=10, height=10, trace_depth=3)

    prod = np.asarray(render(sc, spp=256, seed=3, max_depth=3))
    oracle = OracleRenderer(sc).render(10, 10, spp=48, max_depth=3, seed=11)

    emit = prod.max(-1) > 5.0  # exclude emitter pixels (oracle sees them too but variance is huge)
    a = np.where(emit[..., None], 0, prod)
    c = np.where(emit[..., None], 0, oracle)
    rel = abs(a.mean() - c.mean()) / max(a.mean(), 1e-9)
    assert rel < 0.12, f"oracle mismatch: prod={a.mean():.4f} oracle={c.mean():.4f} rel={rel:.3f}"
    # per-pixel: moderately tight (both are MC estimates at low spp)
    mask = a.mean(-1) > 0.05
    perpix = np.abs(a.mean(-1) - c.mean(-1))[mask] / np.maximum(a.mean(-1)[mask], 1e-9)
    assert np.median(perpix) < 0.25, f"median per-pixel {np.median(perpix):.3f}"


def test_wavefront_matches_oracle_glossy_sphere_light():
    """Widened oracle scope: GGX + mirror lobes and a sphere light
    cross-check the production wavefront (VERDICT round-1 weak #2)."""
    import numpy as np

    from hydracore_tpu.integrators.oracle import OracleRenderer
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder

    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    ggx = b.add_material(diff_color=np.array([0.2, 0.2, 0.2], np.float32),
                         refl_color=np.array([0.5, 0.5, 0.5], np.float32),
                         refl_dist=2, refl_alpha=0.3, refl_gloss=0.7)
    mirror = b.add_material(refl_color=np.array([0.8, 0.8, 0.8], np.float32))
    b.add_box_interior(2.0, ggx, m, mirror, m, m)
    b.sphere_light([0.0, 1.3, 0.0], 0.35, [18.0, 18.0, 18.0])
    sc = b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=8, height=8,
                 trace_depth=3)

    wf = np.asarray(render(sc, spp=160, seed=3, max_depth=3))
    orc = OracleRenderer(sc).render(8, 8, spp=52, max_depth=3, seed=9)
    # exclude direct emitter pixels (different clamping of the bright core)
    mask = wf.max(-1) < 4.0
    rel = abs(wf[mask].mean() - orc[mask].mean()) / max(wf[mask].mean(), 1e-9)
    assert rel < 0.12, f"wavefront={wf[mask].mean():.4f} oracle={orc[mask].mean():.4f}"


def test_wavefront_matches_oracle_glass_transl():
    """Smooth glass (delta Fresnel split) + translucency lobes cross-checked
    against the independent oracle (VERDICT r2 item 5 oracle widening)."""
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    glass = b.add_material(transp_color=np.array([0.9, 0.9, 0.9], np.float32),
                           transp_gloss=1.0, transp_ior=1.5)
    transl = b.add_material(diff_color=np.array([0.15, 0.15, 0.15], np.float32),
                            transl_color=np.array([0.5, 0.5, 0.5], np.float32))
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([-0.6, -1.2, 0.3], 0.7, glass, n_seg=20, n_ring=10)
    b.add_rect([0.9, -0.5, 0.0], [0.6, 0, 0], [0, 0.0, 0.6], transl)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [14.0] * 3)
    sc = b.build(cam_pos=[0, 0, 5.4], cam_lookat=[0, 0, 0], width=8,
                 height=8, trace_depth=4)

    wf = np.asarray(render(sc, spp=192, seed=3, max_depth=4))
    orc = OracleRenderer(sc).render(8, 8, spp=56, max_depth=4, seed=9)
    mask = wf.max(-1) < 4.0
    rel = abs(wf[mask].mean() - orc[mask].mean()) / max(wf[mask].mean(), 1e-9)
    assert rel < 0.13, f"wavefront={wf[mask].mean():.4f} oracle={orc[mask].mean():.4f}"


def test_wavefront_matches_oracle_alpha_mesh_env():
    """Alpha transparency (camera + shadow paths), a mesh light, and a
    textured sky cross-checked against the oracle."""
    from hydracore_tpu.scene.scene import finalize_scene
    from hydracore_tpu.scene.textures import TextureStorage

    b = SceneBuilder()
    m = b.lambert([0.65, 0.6, 0.55])
    b.add_rect([0, -1.0, 0], [4, 0, 0], [0, 0, 4], m, flip=True)  # floor
    storage = TextureStorage()
    otex = np.zeros((1, 1, 4), np.float32)
    otex[..., 0] = 0.4  # 40% opaque
    oslot = storage.add(otex, gamma=1.0)
    occm = b.add_material(diff_color=np.full(3, 0.3, np.float32),
                          opacity_tex=oslot)
    b.add_rect([0, 0.2, 0], [1.5, 0, 0], [0, 0, 1.5], occm, flip=True)
    # textured sky: lat-long gradient
    sky_img = np.ones((8, 16, 4), np.float32)
    sky_img[:, :8, :3] = 0.25
    b.sky([0.6, 0.6, 0.6], img=sky_img)
    # emissive mesh light: a small two-triangle quad
    lid = b.mesh_light([9.0, 8.0, 7.0])
    em = b.emissive([9.0, 8.0, 7.0], light_id=lid)
    b.add_rect([0.8, 1.3, 0.8], [0.3, 0, 0], [0, 0, 0.3], em, light=lid)
    sc = b.build(cam_pos=[0, 1.6, 4.5], cam_lookat=[0, -0.5, 0], width=8,
                 height=8, trace_depth=3)
    texels, table, samplers = storage.finalize()
    sc = finalize_scene(sc.replace(texels=texels, tex_table=table,
                                   tex_sampler=samplers))

    wf = np.asarray(render(sc, spp=192, seed=3, max_depth=3))
    orc = OracleRenderer(sc).render(8, 8, spp=56, max_depth=3, seed=9)
    mask = wf.max(-1) < 4.0
    rel = abs(wf[mask].mean() - orc[mask].mean()) / max(wf[mask].mean(), 1e-9)
    assert rel < 0.13, f"wavefront={wf[mask].mean():.4f} oracle={orc[mask].mean():.4f}"


def test_integrator_family_consistency():
    """StupidPT (BSDF-only), ShadowPT (NEE-only) and MISPT estimate the
    same integral — the reference's CPU integrator family cross-check
    (CPUExp_Integrators.h:317,369,381). A big area light keeps the
    BSDF-only estimator's variance workable at low spp."""
    b = SceneBuilder()
    m = b.lambert([0.55, 0.55, 0.55])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 1.2, 1.2, [4.0, 4.0, 4.0])
    sc = b.build(cam_pos=[0, 0, 5.4], cam_lookat=[0, 0, 0], width=6,
                 height=6, trace_depth=3)

    imgs = {mode: OracleRenderer(sc, mode=mode).render(
        6, 6, spp=220, max_depth=3, seed=5) for mode in
        ("mispt", "ptstupid", "shadowpt")}
    # exclude direct-emitter pixels (shadowpt drops them by design unless
    # reached through specular chains)
    mask = imgs["mispt"].max(-1) < 2.0
    ref = imgs["mispt"][mask].mean()
    for mode in ("ptstupid", "shadowpt"):
        got = imgs[mode][mask].mean()
        rel = abs(got - ref) / max(ref, 1e-9)
        assert rel < 0.15, f"{mode}={got:.4f} vs mispt={ref:.4f} rel={rel:.3f}"


def test_glass_fog_attenuation():
    """Thick-glass Beer fog (attenuationStep, cmaterial.h:2787): a foggy
    glass sphere darkens what is seen through it, and the wavefront
    matches the oracle's independent fog implementation."""
    def build(fog_mult):
        b = SceneBuilder()
        m = b.lambert([0.6, 0.6, 0.6])
        glass = b.add_material(
            transp_color=np.array([0.95, 0.95, 0.95], np.float32),
            transp_gloss=1.0, transp_ior=1.5,
            fog_color=np.array([0.9, 0.3, 0.3], np.float32),
            fog_mult=np.float32(fog_mult))
        b.add_box_interior(2.0, m, m, m, m, m)
        b.add_sphere([0.0, 0.0, 1.5], 0.9, glass, n_seg=20, n_ring=10)
        b.rect_light([0, 1.95, 0], 0.7, 0.7, [12.0] * 3)
        return b.build(cam_pos=[0, 0, 5.4], cam_lookat=[0, 0, 0], width=8,
                       height=8, trace_depth=5)

    sc_fog = build(2.5)
    sc_clear = build(0.0)
    assert sc_fog.settings.has_fog and not sc_clear.settings.has_fog

    wf_fog = np.asarray(render(sc_fog, spp=192, seed=3, max_depth=5))
    wf_clear = np.asarray(render(sc_clear, spp=192, seed=3, max_depth=5))
    # center pixels look through ~1.8 units of fog: exp(-0.1*2.5*1.8)~0.64
    # on red, ~0.04 on green/blue -> strong, colored darkening
    c_fog = wf_fog[3:5, 3:5]
    c_clear = wf_clear[3:5, 3:5]
    assert c_fog[..., 1].mean() < 0.35 * c_clear[..., 1].mean()
    assert c_fog[..., 0].mean() > c_fog[..., 1].mean()  # red fog tint

    orc = OracleRenderer(sc_fog).render(8, 8, spp=56, max_depth=5, seed=9)
    mask = wf_fog.max(-1) < 4.0
    rel = abs(wf_fog[mask].mean() - orc[mask].mean()) / max(wf_fog[mask].mean(), 1e-9)
    assert rel < 0.13, f"wavefront={wf_fog[mask].mean():.4f} oracle={orc[mask].mean():.4f}"
