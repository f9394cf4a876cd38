"""Wide-BVH traversal vs brute-force oracle + binary traversal."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.bvh.builder import brute_force_closest_hit, build_bvh
from hydracore_tpu.bvh.wide import collapse_wide
from hydracore_tpu.ops import traverse_wide


class _WideScene:
    def __init__(self, v0, v1, v2):
        bvh = build_bvh(v0, v1, v2)
        p = bvh.perm
        self.tri_v0 = np.ascontiguousarray(v0[p])
        self.tri_e1 = np.ascontiguousarray((v1 - v0)[p])
        self.tri_e2 = np.ascontiguousarray((v2 - v0)[p])
        w = collapse_wide(bvh, self.tri_v0, self.tri_e1, self.tri_e2)
        self.wbvh_nodes = jnp.asarray(w.nodes)
        self.wbvh_tri9f = jnp.asarray(w.tri9f)
        self.wbvh_slot_tri = jnp.asarray(w.slot_tri)


def _soup(n, rng):
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    a = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    b = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return a, b, d


@pytest.mark.parametrize("n_tris", [1, 9, 250, 3000])
def test_wide_matches_bruteforce(n_tris):
    rng = np.random.default_rng(1000 + n_tris)
    v0, v1, v2 = _soup(n_tris, rng)
    sc = _WideScene(v0, v1, v2)
    R = 256
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    t, tri, u, v = traverse_wide.closest_hit(sc, jnp.asarray(ro), jnp.asarray(rd))
    t = np.asarray(t)
    t_ref, tri_ref, _, _ = brute_force_closest_hit(ro, rd, sc.tri_v0, sc.tri_e1, sc.tri_e2)
    hit, hit_ref = np.isfinite(t), np.isfinite(t_ref)
    assert (hit == hit_ref).all()
    assert np.allclose(t[hit], t_ref[hit], rtol=1e-4, atol=1e-5)
    # winning triangle id must match wherever t is unambiguous
    amb = np.zeros_like(hit)
    assert (np.asarray(tri)[hit & ~amb] == tri_ref[hit & ~amb]).all()


def test_wide_any_hit():
    rng = np.random.default_rng(5)
    v0, v1, v2 = _soup(400, rng)
    sc = _WideScene(v0, v1, v2)
    R = 128
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    t, _, _, _ = traverse_wide.closest_hit(sc, jnp.asarray(ro), jnp.asarray(rd))
    occ = np.asarray(traverse_wide.any_hit(sc, jnp.asarray(ro), jnp.asarray(rd), 1e30))
    assert (occ == np.isfinite(np.asarray(t))).all()
