"""Two-level instancing (bvh/instanced.py): the instanced layout must
render identically to the flattened layout while storing each mesh once.

Reference semantics: BVH4InstTraverse local-space recursion
(hydra_drv/ctrace.h:841) / ConvertBvh4TwoLevel
(bvh_builder/bvh_access_dll2.cpp:388)."""
from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pytest

from hydracore_tpu.scene.statefile import (CameraDesc, InstanceDesc,
                                           RenderSettings, SceneDesc)
from hydracore_tpu.scene.vsgf import MeshData


def _box_mesh(half=1.0, mat=0):
    v = np.array([[x, y, z] for x in (-half, half) for y in (-half, half)
                  for z in (-half, half)], np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    idx = []
    for a, b, c, d in quads:
        idx += [(a, b, c), (a, c, d)]
    idx = np.asarray(idx, np.int32)
    V = len(v)
    pos = np.concatenate([v, np.ones((V, 1), np.float32)], 1)
    nrm = pos / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
    tang = np.tile(np.array([[1, 0, 0, 0]], np.float32), (V, 1))
    uv = (v[:, :2] * 0.5 + 0.5).astype(np.float32)
    return MeshData(pos=pos, norm=nrm, tang=tang, texcoord=uv, indices=idx,
                    mat_indices=np.full(len(idx), mat, np.int32))


def _plane_mesh(size=20.0, y=-1.0, mat=1):
    v = np.array([[-size, y, -size], [size, y, -size],
                  [size, y, size], [-size, y, size]], np.float32)
    idx = np.asarray([(0, 2, 1), (0, 3, 2)], np.int32)
    pos = np.concatenate([v, np.ones((4, 1), np.float32)], 1)
    nrm = np.tile(np.array([[0, 1, 0, 0]], np.float32), (4, 1))
    tang = np.tile(np.array([[1, 0, 0, 0]], np.float32), (4, 1))
    uv = np.zeros((4, 2), np.float32)
    return MeshData(pos=pos, norm=nrm, tang=tang, texcoord=uv, indices=idx,
                    mat_indices=np.full(2, mat, np.int32))


def _mat(mid, color):
    return ET.fromstring(
        f'<material id="{mid}" type="hydra_material" name="m{mid}">'
        f'<diffuse brdf_type="lambert"><color val="{color}"/></diffuse>'
        "</material>")


def _xform(tx, ty, tz, s=1.0, rot_y=0.0):
    c, sn = np.cos(rot_y), np.sin(rot_y)
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = np.array([[c, 0, sn], [0, 1, 0], [-sn, 0, c]]) * s
    M[:3, 3] = (tx, ty, tz)
    return M


@pytest.fixture(scope="module")
def desc():
    lights = {
        0: ET.fromstring(
            '<light id="0" type="sky" shape="sky" distribution="uniform">'
            '<intensity><color val="0.6 0.7 0.9"/>'
            '<multiplier val="1"/></intensity></light>')
    }
    settings = RenderSettings(width=48, height=48, trace_depth=3)
    cam = CameraDesc()
    cam.position = np.array([0, 4, 14], np.float32)
    cam.look_at = np.array([0, 0, 0], np.float32)
    instances = [InstanceDesc(mesh_id=1, matrix=_xform(0, -1.0, 0))]
    for i, (tx, tz, s, ry) in enumerate(
            [(-3, -2, 1.0, 0.3), (0, 0, 0.7, 1.1), (3, -1, 1.3, 2.0),
             (-1.5, 2.5, 0.9, 0.7), (2.0, 2.5, 0.6, 2.8)]):
        instances.append(InstanceDesc(mesh_id=2, matrix=_xform(tx, 0.0, tz, s, ry)))
    return SceneDesc(
        lib_dir="", textures={}, materials={0: _mat(0, "0.7 0.3 0.2"),
                                            1: _mat(1, "0.5 0.5 0.5")},
        lights=lights, camera=cam, settings=settings,
        meshes={1: _plane_mesh(), 2: _box_mesh()},
        mesh_light_id={}, instances=instances, light_instances=[])


def _scenes(desc):
    from hydracore_tpu.scene.scene import assemble

    flat = assemble(desc, instancing="off")
    inst = assemble(desc, instancing="force")
    return flat, inst


def test_layout_shares_meshes(desc):
    flat, inst = _scenes(desc)
    assert inst.settings.has_inst and not flat.settings.has_inst
    # 5 box instances share ONE 12-tri local mesh; flattened stores 5 copies
    assert flat.tri_v0.shape[0] == 2 + 5 * 12
    assert inst.tri_v0.shape[0] == 2 + 12
    assert inst.inst_attr.shape[0] == 6  # world identity + 5 boxes
    assert inst.cl_map.shape[1] % 128 == 0


def test_closest_hit_identity(desc):
    """Primary hits: same t / world position / material under both layouts."""
    import jax.numpy as jnp

    from hydracore_tpu.integrators.pt import compute_hit, make_eye_rays
    from hydracore_tpu.ops.trace_api import closest_hit

    flat, inst = _scenes(desc)
    W = H = 48
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.reshape(-1), jnp.int32)
    py = jnp.asarray(ys.reshape(-1), jnp.int32)
    jit2 = jnp.full((W * H, 2), 0.5, jnp.float32)
    ro, rd = make_eye_rays(flat.camera, px, py, jit2, jit2)

    tf, trif, uf, vf = closest_hit(flat, ro, rd)
    ti, trii, ui, vi = closest_hit(inst, ro, rd)

    hf = np.asarray(trif >= 0)
    hi = np.asarray(trii >= 0)
    assert (hf == hi).mean() > 0.999  # grazing-edge disagreements only
    both = hf & hi
    assert np.allclose(np.asarray(tf)[both], np.asarray(ti)[both],
                       rtol=1e-3, atol=1e-3)

    pf = compute_hit(flat, trif, uf, vf, ro, rd, tf)
    pi = compute_hit(inst, trii, ui, vi, ro, rd, ti)
    # world position, shading normal, material agree
    assert np.allclose(np.asarray(pf[0])[both], np.asarray(pi[0])[both],
                       atol=2e-3)
    ncos = np.sum(np.asarray(pf[1])[both] * np.asarray(pi[1])[both], axis=1)
    assert ncos.min() > 0.999
    assert (np.asarray(pf[4])[both] == np.asarray(pi[4])[both]).all()


def test_render_identity(desc):
    """A small render matches between layouts (same transport, different
    traversal order -> tiny numeric differences only)."""
    from hydracore_tpu.integrators.pt import render

    flat, inst = _scenes(desc)
    img_f = np.asarray(render(flat, spp=4, seed=3))
    img_i = np.asarray(render(inst, spp=4, seed=3))
    mse = float(((img_f - img_i) ** 2).mean())
    assert mse < 1e-4, mse
