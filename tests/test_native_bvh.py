"""Native C++ SAH builder vs numpy builder and brute-force traversal."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.bvh.builder import brute_force_closest_hit
from hydracore_tpu.bvh.native import build_bvh_native, native_available
from hydracore_tpu.bvh.wide import collapse_wide
from hydracore_tpu.ops import traverse_wide

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++")


def _soup(n, rng):
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    return (c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
            c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32),
            c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32))


@pytest.mark.parametrize("n_tris", [3, 500, 20000])
def test_native_builder_correct(n_tris):
    rng = np.random.default_rng(n_tris)
    v0, v1, v2 = _soup(n_tris, rng)
    bvh = build_bvh_native(v0, v1, v2)
    assert sorted(bvh.perm.tolist()) == list(range(n_tris))
    # leaves cover all tris exactly once, within wide-leaf capacity
    leaf = bvh.count > 0
    assert bvh.count[leaf].sum() == n_tris
    assert bvh.count.max() <= 8

    # end-to-end: wide collapse + traversal matches brute force
    p = bvh.perm
    tv0, te1, te2 = v0[p], (v1 - v0)[p], (v2 - v0)[p]
    w = collapse_wide(bvh, tv0, te1, te2)

    class S:
        pass

    s = S()
    s.wbvh_nodes = jnp.asarray(w.nodes)
    s.wbvh_tri9f = jnp.asarray(w.tri9f)
    s.wbvh_slot_tri = jnp.asarray(w.slot_tri)
    R = 200
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    t, tri, _, _ = traverse_wide.closest_hit(s, jnp.asarray(ro), jnp.asarray(rd))
    t_ref, _, _, _ = brute_force_closest_hit(ro, rd, tv0, te1, te2)
    hit = np.isfinite(np.asarray(t))
    assert (hit == np.isfinite(t_ref)).all()
    assert np.allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4, atol=1e-5)


def test_presplit_correct():
    """Pre-split (early_split.h SubdivMetric semantics): large thin
    triangles get multiple clipped references; traversal over the
    duplicated-leaf BVH still matches brute force, and masked (emissive)
    triangles stay single-reference."""
    rng = np.random.default_rng(7)
    v0, v1, v2 = _soup(2000, rng)
    # a few huge thin diagonal triangles spanning the whole soup
    big = np.array([
        [[-6, -6, -6], [6, 6, 6], [6, 6.01, 6]],
        [[-6, 6, -6], [6, -6, 6], [6, -6.01, 6]],
        [[-6, -6, 6], [6, 6, -6], [6.01, 6, -6]],
    ], np.float32)
    v0 = np.concatenate([v0, big[:, 0]])
    v1 = np.concatenate([v1, big[:, 1]])
    v2 = np.concatenate([v2, big[:, 2]])
    T = v0.shape[0]

    mask = np.ones(T, bool)
    mask[T - 1] = False  # pretend the last big tri is a mesh light
    bvh = build_bvh_native(v0, v1, v2, splittable=mask, presplit=True)
    perm = bvh.perm
    assert perm.size > T, "huge triangles should have split into refs"
    assert sorted(set(perm.tolist())) == list(range(T)), "every tri covered"
    counts = np.bincount(perm, minlength=T)
    assert counts[T - 1] == 1, "masked tri must stay single-reference"
    assert counts[T - 3:T - 1].max() > 1, "unmasked big tris must split"
    leaf = bvh.count > 0
    assert bvh.count[leaf].sum() == perm.size

    tv0, te1, te2 = v0[perm], (v1 - v0)[perm], (v2 - v0)[perm]
    w = collapse_wide(bvh, tv0, te1, te2)

    class S:
        pass

    s = S()
    s.wbvh_nodes = jnp.asarray(w.nodes)
    s.wbvh_tri9f = jnp.asarray(w.tri9f)
    s.wbvh_slot_tri = jnp.asarray(w.slot_tri)
    R = 256
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    t, tri, _, _ = traverse_wide.closest_hit(s, jnp.asarray(ro), jnp.asarray(rd))
    # brute force over the ORIGINAL (unsplit) triangles
    t_ref, _, _, _ = brute_force_closest_hit(ro, rd, v0, v1 - v0, v2 - v0)
    hit = np.isfinite(np.asarray(t))
    assert (hit == np.isfinite(t_ref)).all()
    assert np.allclose(np.asarray(t)[hit], t_ref[hit], rtol=1e-4, atol=1e-5)
    # duplicated refs must map back to the same source triangle
    tri_np = np.asarray(tri)[hit]
    assert (perm[tri_np] < T).all()


def test_native_faster_than_numpy_on_big_input():
    import time

    from hydracore_tpu.bvh.builder import build_bvh

    rng = np.random.default_rng(1)
    v0, v1, v2 = _soup(120000, rng)
    t0 = time.perf_counter()
    b_native = build_bvh_native(v0, v1, v2)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    b_numpy = build_bvh(v0, v1, v2)
    t_numpy = time.perf_counter() - t0
    assert b_native.num_nodes > 0 and b_numpy.num_nodes > 0
    assert t_native < t_numpy, f"native {t_native:.2f}s vs numpy {t_numpy:.2f}s"


def test_bvh_stats():
    from hydracore_tpu.bvh.builder import build_bvh, bvh_stats

    rng = np.random.default_rng(9)
    v0, v1, v2 = _soup(5000, rng)
    st = bvh_stats(build_bvh(v0, v1, v2))
    assert st["tris"] == 5000
    assert st["max_leaf"] <= 8
    assert 5 < st["max_depth"] < 64
    assert st["sah_cost"] > 0
