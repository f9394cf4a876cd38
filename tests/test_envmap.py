"""Env-map importance sampling: pdf consistency + furnace with tables."""
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.lights.envmap import build_env_pdf, env_pdf_for_dir, sample_env_dir


def test_env_pdf_integrates_to_one():
    """MC check: E[1/pdf(d)] over table samples = total solid angle 4*pi,
    and pdf_for_dir agrees with the pdf returned at the sample."""
    rng = np.random.default_rng(3)
    img = rng.random((16, 32, 4)).astype(np.float32) ** 3 + 0.01  # spiky env
    rows, cols, pdf_uv = build_env_pdf(img)
    rows_j, cols_j, pdf_j = jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(pdf_uv)

    N = 200000
    u1 = jnp.asarray(rng.random(N).astype(np.float32))
    u2 = jnp.asarray(rng.random(N).astype(np.float32))
    d, pdf = sample_env_dir(rows_j, cols_j, pdf_j, u1, u2)
    d = np.asarray(d)
    assert np.allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    est = float(np.mean(1.0 / np.asarray(pdf)))
    assert abs(est - 4 * np.pi) / (4 * np.pi) < 0.03, f"solid angle {est} != 4pi"

    pdf2 = np.asarray(env_pdf_for_dir(rows_j, cols_j, pdf_j, jnp.asarray(d)))
    ratio = pdf2 / np.asarray(pdf)
    assert np.median(np.abs(ratio - 1)) < 0.02


def test_furnace_still_holds_with_tables():
    """The importance tables change variance, never the expectation."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder

    rho = 0.55
    b = SceneBuilder()
    b.sky([1.0, 1.0, 1.0])
    m = b.lambert([rho] * 3)
    b.add_sphere([0, 0, 0], 1.0, m, n_seg=32, n_ring=16)
    sc = b.build(cam_pos=[0, 0, 4], cam_lookat=[0, 0, 0], width=32, height=32, trace_depth=3)
    img = np.asarray(render(sc, spp=96, seed=11))
    c = img[12:20, 12:20].mean(axis=(0, 1))
    assert np.allclose(c, rho, atol=0.03), f"furnace {c} != {rho}"


def test_env_back_plate_cam_projected():
    """Sky <back> second env (backColorOfSecondEnv, cbidir.h:543):
    camera-visible misses show the back texture in SCREEN space; surfaces
    still shade from the primary env."""
    from hydracore_tpu.integrators.pt import render
    from hydracore_tpu.scene.procedural import SceneBuilder
    from hydracore_tpu.scene.scene import finalize_scene
    from hydracore_tpu.scene.textures import TextureStorage

    b = SceneBuilder()
    b.sky([1.0, 1.0, 1.0])
    m = b.lambert([0.7] * 3)
    b.add_rect([0, -1.2, 0], [4, 0, 0], [0, 0, 4], m, flip=True)  # floor
    sc = b.build(cam_pos=[0, 0, 4], cam_lookat=[0, 0, 0], width=24,
                 height=24, trace_depth=3)

    storage = TextureStorage()
    tex = np.zeros((4, 16, 4), np.float32)
    tex[:, 8:, :3] = 4.0  # right half bright, left black
    tex[..., 3] = 1.0
    slot = storage.add(tex, gamma=1.0)
    texels, table, samplers = storage.finalize()
    env_back = np.zeros(8, np.float32)
    env_back[:6] = [slot, 2.0, 1.0, 1.0, 1.0, 1.0]  # cam-projected
    import dataclasses
    sc = finalize_scene(sc.replace(
        texels=texels, tex_table=table, tex_sampler=samplers,
        env_back=env_back,
        settings=dataclasses.replace(sc.settings, has_env_back=True)))

    img = np.asarray(render(sc, spp=8, seed=7))
    # sky region (top rows): left dark, right bright per the back plate
    left = img[2:8, 2:8].mean()
    right = img[2:8, 16:22].mean()
    assert right > 2.0, f"back plate right half missing: {right}"
    assert left < 0.1, f"back plate left half leaked: {left}"
    # floor (bottom center) still lit by the white primary env, not black
    floor = img[18:22, 8:16].mean()
    assert 0.2 < floor < 1.5, f"floor should shade from primary env: {floor}"
