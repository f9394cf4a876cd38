"""Cluster-dense traversal correctness (Pallas interpret mode on CPU).

Validates ops/traverse_cluster.py + bvh/clusters.py against the XLA
wide-BVH traversal and brute force on a procedural scene.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.bvh.clusters import cut_clusters
from hydracore_tpu.ops import traverse_cluster as tc
from hydracore_tpu.ops import traverse_wide as tw
from hydracore_tpu.scene.procedural import SceneBuilder


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.lambert([0.7, 0.7, 0.7])
    for _ in range(350):
        c = rng.uniform(-4, 4, 3)
        vx = rng.uniform(-0.4, 0.4, 3)
        vy = rng.uniform(-0.4, 0.4, 3)
        b.add_rect(c, vx, vy, m)
    return b.build(cam_pos=[0, 0, 10], cam_lookat=[0, 0, 0],
                   width=8, height=8)


@pytest.fixture(scope="module")
def rays(scene):
    rng = np.random.default_rng(3)
    R = tc.R_BLK * 3
    ro = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(tc, "INTERPRET", True)


def test_cluster_cut_covers_all_triangles(scene):
    st = np.asarray(scene.cl_slot_tri)
    ids = np.sort(st[st >= 0])
    assert np.array_equal(ids, np.arange(scene.num_triangles))
    C = int(np.asarray(scene.cl_tris).shape[0])
    assert C % 128 == 0


def test_closest_matches_wide(scene, rays):
    ro, rd = rays
    t_c, tri_c, u_c, v_c = tc.closest_hit(scene, ro, rd)
    t_w, tri_w, u_w, v_w = tw.closest_hit(scene, ro, rd)
    hit_c = np.asarray(tri_c) >= 0
    hit_w = np.asarray(tri_w) >= 0
    assert np.array_equal(hit_c, hit_w)
    np.testing.assert_allclose(np.asarray(t_c)[hit_c], np.asarray(t_w)[hit_w],
                               rtol=1e-4)
    # same triangle unless the ray hit a shared edge/coplanar pair
    same = np.asarray(tri_c) == np.asarray(tri_w)
    assert same[hit_c].mean() > 0.98
    np.testing.assert_allclose(np.asarray(u_c)[same & hit_c],
                               np.asarray(u_w)[same & hit_c], atol=1e-3)


def test_anyhit_matches_wide(scene, rays):
    ro, rd = rays
    occ_c = np.asarray(tc.any_hit(scene, ro, rd, 6.0))
    occ_w = np.asarray(tw.any_hit(scene, ro, rd, 6.0))
    assert np.array_equal(occ_c, occ_w)


def test_active_mask_and_tmax(scene, rays):
    ro, rd = rays
    act = np.zeros(ro.shape[0], bool)
    act[::2] = True
    t, tri, _, _ = tc.closest_hit(scene, ro, rd, t_max=4.0,
                                  active=jnp.asarray(act))
    tri = np.asarray(tri)
    t = np.asarray(t)
    assert (tri[~act] == -1).all()
    assert (t[tri >= 0] < 4.0 + 1e-5).all()


def test_cut_clusters_small_tree():
    rng = np.random.default_rng(0)
    v0 = rng.uniform(-1, 1, (37, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (37, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (37, 3)).astype(np.float32)
    from hydracore_tpu.bvh.builder import build_bvh

    bvh = build_bvh(v0, v0 + e1, v0 + e2)
    cl = cut_clusters(bvh, v0[bvh.perm], e1[bvh.perm], e2[bvh.perm])
    st = cl.slot_tri[cl.slot_tri >= 0]
    assert np.array_equal(np.sort(st), np.arange(37))


def test_cluster_cut_invariance_large_cp():
    """Traversal results must not depend on the cluster cut: a degenerate
    k_tris=1 cut (thousands of clusters — the scale that used to route to
    the deleted HBM big mode; now plain VMEM residency) must match the
    k_tris=128 cut exactly on hits."""
    rng = np.random.default_rng(11)
    T = 9000
    v0 = rng.uniform(-3, 3, (T, 3)).astype(np.float32)
    e1 = rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    e2 = rng.uniform(-0.2, 0.2, (T, 3)).astype(np.float32)
    from hydracore_tpu.bvh.builder import build_bvh
    from hydracore_tpu.bvh.clusters import cut_clusters

    bvh = build_bvh(v0, v0 + e1, v0 + e2)
    p = bvh.perm
    small = cut_clusters(bvh, v0[p], e1[p], e2[p], k_tris=128)
    big = cut_clusters(bvh, v0[p], e1[p], e2[p], k_tris=1)
    assert big.tris.shape[0] > 1024 >= small.tris.shape[0]

    R = tc.R_BLK * max(1024 // tc.R_BLK, 1)
    ro = rng.uniform(-4, 4, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    rays, _ = tc._to_blocks(jnp.asarray(ro), jnp.asarray(rd), 1e30, None)

    t_s, sl_s, _ = tc._cluster_traverse(rays, small.bounds_oct,
                                        jnp.asarray(small.tris),
                                        jnp.asarray(small.oct_perm),
                                        interpret=True)
    t_b, sl_b, _ = tc._cluster_traverse(rays, big.bounds_oct,
                                        jnp.asarray(big.tris),
                                        jnp.asarray(big.oct_perm),
                                        interpret=True)
    t_s, t_b = np.asarray(t_s).ravel(), np.asarray(t_b).ravel()
    hs = np.asarray(sl_s).ravel() >= 0
    hb = np.asarray(sl_b).ravel() >= 0
    assert (hs == hb).all()
    np.testing.assert_allclose(t_s[hs], t_b[hs], rtol=1e-4)
