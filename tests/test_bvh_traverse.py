"""BVH build + traversal vs brute-force oracle (numpy Möller–Trumbore),
mirroring the reference's CPU-oracle test strategy (SURVEY.md §4.4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.bvh.builder import brute_force_closest_hit, build_bvh
from hydracore_tpu.ops.traverse import any_hit, closest_hit


def random_tri_soup(n, rng):
    c = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    a = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    b = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    d = c + rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    return a, b, d


class _FakeScene:
    def __init__(self, v0, v1, v2):
        bvh = build_bvh(v0, v1, v2)
        p = bvh.perm
        self.tri_v0 = jnp.asarray(v0[p])
        self.tri_e1 = jnp.asarray((v1 - v0)[p])
        self.tri_e2 = jnp.asarray((v2 - v0)[p])
        self.bvh_bmin = jnp.asarray(bvh.bmin)
        self.bvh_bmax = jnp.asarray(bvh.bmax)
        self.bvh_left = jnp.asarray(bvh.left)
        self.bvh_right = jnp.asarray(bvh.right)
        self.bvh_count = jnp.asarray(bvh.count)


@pytest.mark.parametrize("n_tris", [1, 7, 100, 1500])
def test_closest_hit_matches_bruteforce(n_tris):
    rng = np.random.default_rng(42 + n_tris)
    v0, v1, v2 = random_tri_soup(n_tris, rng)
    sc = _FakeScene(v0, v1, v2)

    R = 256
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    t, tri, u, v = closest_hit(sc, jnp.asarray(ro), jnp.asarray(rd))
    t = np.asarray(t)

    t_ref, _, _, _ = brute_force_closest_hit(
        ro, rd, np.asarray(sc.tri_v0), np.asarray(sc.tri_e1), np.asarray(sc.tri_e2)
    )
    hit_ref = np.isfinite(t_ref)
    hit = np.isfinite(t)
    assert (hit == hit_ref).all(), f"hit mask mismatch: {np.sum(hit != hit_ref)} rays"
    assert np.allclose(t[hit], t_ref[hit], rtol=1e-4, atol=1e-5)


def test_any_hit_consistent_with_closest():
    rng = np.random.default_rng(7)
    v0, v1, v2 = random_tri_soup(300, rng)
    sc = _FakeScene(v0, v1, v2)
    R = 128
    ro = rng.uniform(-8, 8, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)

    t, _, _, _ = closest_hit(sc, jnp.asarray(ro), jnp.asarray(rd))
    occ = np.asarray(any_hit(sc, jnp.asarray(ro), jnp.asarray(rd), t_max=1e30))
    assert (occ == np.isfinite(np.asarray(t))).all()

    # with t_max below the closest hit, must be unoccluded
    t_np = np.asarray(t)
    finite = np.isfinite(t_np)
    occ2 = np.asarray(
        any_hit(sc, jnp.asarray(ro), jnp.asarray(rd), t_max=jnp.asarray(np.where(finite, t_np * 0.5, 1e-3), np.float32))
    )
    assert not occ2.any()


def test_scene42_primary_rays_hit_box(test42_scene):
    sc = test42_scene
    # camera at (0,0,15) looking at origin: center ray must hit the box back wall
    ro = jnp.asarray([[0.0, 0.0, 15.0]] * 8)
    rd = jnp.asarray([[0.0, 0.0, -1.0]] * 8)
    t, tri, _, _ = closest_hit(sc, ro, rd)
    assert np.isfinite(np.asarray(t)).all()
    assert np.asarray(t)[0] == pytest.approx(19.0, abs=0.5)  # box back wall z=-4
