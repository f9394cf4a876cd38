"""Partitioned cluster traversal — the big-scene multi-chunk path.

Scenes whose cluster pool exceeds the VMEM cap are split into stacked
(P, Cpp, 4, 384) chunks (bvh/clusters.py partition_clusters) and the
dispatcher chains the VMEM kernel over them with t-threading — the
TPU-native analogue of the reference's multi-tree traversal loop
(GPUOCLKernels.cpp:424-512 iterates up to MAXBVHTREES=4 trees per
bounce). Parity here runs the Pallas kernel in interpret mode on CPU
against the independent wide-BVH traversal.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

SCENE = "/root/reference/hydra_app/tests/test_224_sphere"


@pytest.fixture(scope="module")
def part_scene():
    import os

    from hydracore_tpu.scene.scene import load_scene

    old = os.environ.get("HYDRA_CL_PART_CAP")
    os.environ["HYDRA_CL_PART_CAP"] = "128"
    try:
        sc = load_scene(SCENE, width=64, height=64)
    finally:
        if old is None:
            os.environ.pop("HYDRA_CL_PART_CAP", None)
        else:
            os.environ["HYDRA_CL_PART_CAP"] = old
    assert sc.cl_tris.ndim == 4 and sc.cl_tris.shape[0] >= 2, \
        f"expected a partitioned pool, got {sc.cl_tris.shape}"
    return sc


def _rays(sc, R=1024, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.asarray(sc.world_bmin)
    hi = lo + np.asarray(sc.world_bext)
    ro = rng.uniform(lo - 0.1 * (hi - lo), hi + 0.1 * (hi - lo),
                     (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_partition_layout(part_scene):
    sc = part_scene
    P, Cpp = sc.cl_tris.shape[0], sc.cl_tris.shape[1]
    assert Cpp == 128
    assert sc.cl_bounds_oct.shape == (P, 8, 8, Cpp)
    assert sc.cl_oct_perm.shape == (P, 8, Cpp)
    # flat slot table is partition-major padded; every real tri id appears
    slot = np.asarray(sc.cl_slot_tri)
    assert slot.shape == (P * Cpp * 128,)
    T = sc.tri_v0.shape[0]
    ids = slot[slot >= 0]
    assert ids.size == T and np.array_equal(np.sort(ids), np.arange(T))


def test_partitioned_closest_hit_matches_wide(part_scene):
    from hydracore_tpu.ops import traverse_cluster as tc
    from hydracore_tpu.ops import traverse_wide as tw

    sc = part_scene
    ro, rd = _rays(sc)
    t_p, tri_p, u_p, v_p = jax.tree.map(np.asarray,
                                        tc.closest_hit(sc, ro, rd))
    t_w, tri_w, _, _ = jax.tree.map(np.asarray, tw.closest_hit(sc, ro, rd))

    hit_p, hit_w = tri_p >= 0, tri_w >= 0
    assert (hit_p == hit_w).mean() > 0.999
    both = hit_p & hit_w
    assert both.any()
    # ties between equal-t duplicates may pick either winner; ids must
    # agree everywhere the hit distance is unambiguous
    same = tri_p[both] == tri_w[both]
    close = np.isclose(t_p[both], t_w[both], rtol=1e-3, atol=1e-4)
    assert close.mean() > 0.999
    assert (same | close).mean() > 0.999


def test_partitioned_any_hit_matches_wide(part_scene):
    from hydracore_tpu.ops import traverse_cluster as tc
    from hydracore_tpu.ops import traverse_wide as tw

    sc = part_scene
    ro, rd = _rays(sc, seed=1)
    occ_p = np.asarray(tc.any_hit(sc, ro, rd, t_max=1e30))
    occ_w = np.asarray(tw.any_hit(sc, ro, rd, t_max=1e30))
    assert (occ_p == occ_w).mean() > 0.999
    # bounded t_max variant (the NEE shadow shape)
    occ_p2 = np.asarray(tc.any_hit(sc, ro, rd, t_max=2.0))
    occ_w2 = np.asarray(tw.any_hit(sc, ro, rd, t_max=2.0))
    assert (occ_p2 == occ_w2).mean() > 0.999
    assert occ_p2.sum() <= occ_p.sum()


def test_partition_of_clusterset_equals_flat(part_scene):
    """partition_clusters must preserve every cluster's box + Woop block."""
    import os

    from hydracore_tpu.scene.scene import load_scene

    os.environ["HYDRA_NO_CL_PART"] = "1"
    try:
        flat = load_scene(SCENE, width=64, height=64)
    finally:
        os.environ.pop("HYDRA_NO_CL_PART", None)
    sc = part_scene
    P, Cpp = sc.cl_tris.shape[0], sc.cl_tris.shape[1]
    C = flat.cl_tris.shape[0]
    stacked = np.asarray(sc.cl_tris).reshape(P * Cpp, 4, 384)
    # real clusters match chunk-by-chunk (padding rows differ)
    for p in range(P):
        lo = p * Cpp
        n = min(C - lo, Cpp)
        if n <= 0:
            break
        np.testing.assert_array_equal(stacked[p * Cpp : p * Cpp + n],
                                      np.asarray(flat.cl_tris)[lo : lo + n])
