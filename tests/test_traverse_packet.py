"""Packet-traversal kernel correctness (Pallas interpret mode on CPU).

Validates the exact kernel logic of ops/traverse_packet.py against the
XLA wide-BVH traversal and brute force on a procedural scene.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.ops import traverse_packet as tp
from hydracore_tpu.ops import traverse_wide as tw
from hydracore_tpu.scene.procedural import SceneBuilder


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    b = SceneBuilder()
    m = b.lambert([0.7, 0.7, 0.7])
    # a cloud of random rects big enough to exercise a multi-level tree
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
    R = tp.PKT * 2
    ro = rng.uniform(-6, 6, (R, 3)).astype(np.float32)
    rd = rng.normal(size=(R, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return jnp.asarray(ro), jnp.asarray(rd)


def test_packet_closest_matches_wide(scene, rays, monkeypatch):
    monkeypatch.setattr(tp, "INTERPRET", True)
    ro, rd = rays
    t_p, tri_p, u_p, v_p = tp.closest_hit(scene, ro, rd)
    t_w, tri_w, u_w, v_w = tw.closest_hit(scene, ro, rd)
    t_p, t_w = np.asarray(t_p), np.asarray(t_w)
    assert (np.asarray(tri_p) == np.asarray(tri_w)).mean() > 0.999
    both = np.isfinite(t_p) & np.isfinite(t_w)
    assert np.allclose(t_p[both], t_w[both], rtol=1e-4, atol=1e-5)
    assert np.allclose(np.asarray(u_p)[both], np.asarray(u_w)[both],
                       rtol=1e-3, atol=1e-4)


def test_packet_any_hit_and_active_mask(scene, rays, monkeypatch):
    monkeypatch.setattr(tp, "INTERPRET", True)
    ro, rd = rays
    R = ro.shape[0]
    t_w, _, _, _ = tw.closest_hit(scene, ro, rd)
    tmax = jnp.full((R,), 6.0)
    occ = tp.any_hit(scene, ro, rd, tmax)
    occ_ref = np.asarray(t_w) < 6.0
    # any-hit may find ANY tri within tmax; where the closest is within
    # range occlusion must be reported, where no hit exists it must not be
    assert np.asarray(occ)[occ_ref].all()
    t_far = np.asarray(t_w)
    assert not np.asarray(occ)[~np.isfinite(t_far)].any()

    # inactive rays never report hits and never contaminate others
    act = jnp.zeros(R, bool).at[: R // 2].set(True)
    t_a, tri_a, _, _ = tp.closest_hit(scene, ro, rd, active=act)
    t_a = np.asarray(t_a)
    assert not np.isfinite(t_a[R // 2:]).any()
    t_full, tri_full, _, _ = tp.closest_hit(scene, ro, rd)
    both = np.isfinite(t_a[: R // 2])
    assert np.allclose(t_a[: R // 2][both],
                       np.asarray(t_full)[: R // 2][both], rtol=1e-5)


def test_packet_tmax_respected(scene, rays, monkeypatch):
    monkeypatch.setattr(tp, "INTERPRET", True)
    ro, rd = rays
    R = ro.shape[0]
    t_w, _, _, _ = tw.closest_hit(scene, ro, rd)
    cap = 4.0
    t_c, tri_c, _, _ = tp.closest_hit(scene, ro, rd, t_max=cap)
    t_c = np.asarray(t_c)
    fin = np.isfinite(t_c)
    assert (t_c[fin] < cap + 1e-4).all()
    ref_in = np.asarray(t_w) < cap * 0.999
    assert fin[ref_in].all()
