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
