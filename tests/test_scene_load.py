"""Scene ingestion tests against the bundled reference scene libraries
(statefile XML + vsgf/image4ub chunks, ref hydra_app/tests/)."""
import numpy as np
import pytest

from hydracore_tpu.scene.statefile import load_statefile


def test_statefile_parse(test42_dir):
    desc = load_statefile(test42_dir)
    assert desc.settings.trace_depth == 5
    assert desc.settings.max_rays_per_pixel == 256
    assert desc.settings.width == 1024
    assert len(desc.materials) == 10
    assert len(desc.lights) == 1
    # teapot chunk_00003 is absent from the repo copy; box/plane/sphere/torus
    # and the light mesh must load
    assert 1 in desc.meshes and 5 in desc.meshes
    box = desc.meshes[1]
    assert box.num_triangles == 10
    assert box.num_vertices == 24
    assert np.isfinite(box.pos).all()
    # light instance present
    assert len(desc.light_instances) == 1
    assert desc.light_instances[0].matrix[1, 3] == pytest.approx(3.85)


def test_scene_assemble(test42_scene):
    sc = test42_scene
    assert sc.num_triangles >= 12  # box (10) + light rect (2)
    assert sc.tri_mat.max() < sc.materials.em_color.shape[0]
    # area light material 9 is emissive 31.4
    assert np.allclose(np.asarray(sc.materials.em_color)[9], 31.4, atol=1e-3)
    # light table has exactly one instanced area light
    lt = sc.lights
    assert np.asarray(lt.ltype).tolist().count(4) == 1  # LIGHT_AREA_RECT
    row = np.asarray(lt.ltype).tolist().index(4)
    assert np.asarray(lt.pos)[row][1] == pytest.approx(3.85)
    assert np.asarray(lt.area)[row] == pytest.approx(4.0)
    # light-mesh triangles link back to the light row for MIS
    linked = np.asarray(sc.tri_light)
    assert (linked == row).sum() == 2
    # camera
    assert sc.camera.pos[2] == pytest.approx(15.0)


def test_fit_texture_res_budget():
    """FitTextureRes analogue (RenderDriverRTE.cpp:565-650): heaviest
    texture of the over-budget pool is halved, max 3 times each, per-pool
    (common vs bump) budgets."""
    from hydracore_tpu.scene.textures import _BYTES_PER_TEXEL, downscale2x, fit_texture_res

    # box filter halves resolution and preserves the mean
    img = np.random.default_rng(0).random((8, 6, 4)).astype(np.float32)
    half = downscale2x(img)
    assert half.shape == (4, 3, 4)
    assert np.allclose(half.mean(), img.mean(), atol=1e-6)

    big = np.ones((64, 64, 4), np.float32)
    small = np.ones((8, 8, 4), np.float32)
    bump = np.ones((32, 32, 4), np.float32)
    imgs = {1: big.copy(), 2: small.copy(), 3: bump.copy()}
    is_bump = {1: False, 2: False, 3: True}
    # common budget fits small + big/4 (one halving of the big texture);
    # bump budget fits bump untouched
    budget = (8 * 8 + 32 * 32) * _BYTES_PER_TEXEL
    out = fit_texture_res(imgs, is_bump, budget=budget,
                          budget_bump=32 * 32 * _BYTES_PER_TEXEL)
    assert out[1].shape[:2] == (32, 32)       # halved once
    assert out[2].shape[:2] == (8, 8)         # untouched
    assert out[3].shape[:2] == (32, 32)       # bump pool within budget

    # cap: never more than 3 halvings even if still over budget
    out = fit_texture_res({1: big.copy()}, {1: False}, budget=1,
                          budget_bump=1)
    assert out[1].shape[:2] == (8, 8)


def test_texture_budget_through_scene_path(test42_dir):
    """build_texture_storage honors the memory budget end-to-end: a tiny
    budget forces downscales (AllocAll + FitTextureRes semantics) and the
    packed heap shrinks accordingly."""
    from hydracore_tpu.scene.statefile import load_statefile
    from hydracore_tpu.scene.textures import build_texture_storage

    lib = "/root/reference/hydra_app/tests/014_Bump_height"
    import os

    if not os.path.exists(lib):
        pytest.skip("bundled scene missing")
    desc = load_statefile(lib)
    full = build_texture_storage(desc)
    small = build_texture_storage(desc, budget=64 << 10, budget_bump=64 << 10)
    assert small[0].shape[0] < full[0].shape[0]  # heap texel count shrank
    # every downscaled texture keeps its table entry and stays addressable
    assert small[1].shape == full[1].shape


def test_all_bundled_scenes_parse():
    import pathlib

    root = pathlib.Path("/root/reference/hydra_app/tests")
    if not root.exists():
        pytest.skip("no reference scenes")
    ok = 0
    for d in sorted(root.iterdir()):
        if not (d / "data").exists():
            continue
        desc = load_statefile(str(d))
        assert desc.settings.width > 0
        ok += 1
    assert ok >= 10
