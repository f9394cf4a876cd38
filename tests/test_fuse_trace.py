"""Fused shadow+extension traversal (HYDRA_FUSE_TRACE=1) vs the unfused
pass loop.

The fused schedule defers bounce d's NEE occlusion query into bounce d+1's
extension dispatch (one 2R-wide closest-hit instead of separate closest-hit
+ any-hit), flushing the final bounce's query with one dedicated any-hit.
Contributions land in the same per-lane order, so images must agree to
floating-point identity (the occlusion predicate — hit exists within
0.995*dist — is shared)."""
import numpy as np
import pytest

from hydracore_tpu.integrators.pt import render_passes
from hydracore_tpu.scene.procedural import SceneBuilder


def _box_scene(trace_depth=5):
    b = SceneBuilder()
    m = b.lambert([0.6, 0.55, 0.5])
    red = b.lambert([0.7, 0.1, 0.1])
    mirror = b.add_material(refl_color=np.array([0.85, 0.85, 0.85],
                                                np.float32))
    b.add_box_interior(2.0, m, m, m, red, m)
    b.add_sphere([-0.6, -1.2, 0.2], 0.7, mirror, n_seg=12, n_ring=6)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [13.0] * 3)
    return b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=16,
                   height=16, trace_depth=trace_depth)


def _render(sc, fuse: bool, monkeypatch, max_depth=5):
    import jax
    import jax.numpy as jnp

    if fuse:
        monkeypatch.setenv("HYDRA_FUSE_TRACE", "1")
    else:
        monkeypatch.delenv("HYDRA_FUSE_TRACE", raising=False)
    jax.clear_caches()  # env knob is read at trace time
    fb, rays = render_passes(sc, jnp.uint32(3), jnp.uint32(77), n_pass=4,
                             max_depth=max_depth)
    return np.asarray(fb), float(rays)


@pytest.mark.parametrize("max_depth", [1, 2, 5])
def test_fuse_trace_matches_unfused(monkeypatch, max_depth):
    sc = _box_scene(trace_depth=max_depth)
    a, rays_a = _render(sc, False, monkeypatch, max_depth)
    b, rays_b = _render(sc, True, monkeypatch, max_depth)
    assert np.array_equal(a, b), \
        f"max abs diff {np.abs(a - b).max():.3e}"
    # the fused schedule traces the same rays, just batched differently
    assert rays_a == rays_b


def test_fuse_trace_final_bounce_nee_flushed(monkeypatch):
    """max_depth=1 has NO second extension dispatch: the deferred NEE must
    still land (regression test for dropping the tail of the pend chain)."""
    sc = _box_scene(trace_depth=1)
    b, _ = _render(sc, True, monkeypatch, max_depth=1)
    # direct lighting must be present, not just emission: the lit floor
    # region is non-black in a depth-1 render only via the flushed NEE
    assert b.sum() > 0.0
    a, _ = _render(sc, False, monkeypatch, max_depth=1)
    assert np.array_equal(a, b)


def test_fuse_regen_matches_unfused_regen(monkeypatch):
    """The regen loop's fused variant (pend query rides the next body's
    dispatch, delayed death splat) produces the same estimator: same sample
    set, same per-lane accumulation order; only the fb splat iteration
    order changes (same-pixel adds may re-associate)."""
    import jax
    import jax.numpy as jnp

    from hydracore_tpu.integrators.pt_regen import (regen_supported,
                                                    render_passes_regen)

    sc = _box_scene(trace_depth=5)
    assert regen_supported(sc)

    def run(fuse):
        if fuse:
            monkeypatch.setenv("HYDRA_FUSE_TRACE", "1")
        else:
            monkeypatch.delenv("HYDRA_FUSE_TRACE", raising=False)
        jax.clear_caches()
        fb, rays = render_passes_regen(sc, jnp.uint32(3), jnp.uint32(77),
                                       n_pass=6, max_depth=5)
        return np.asarray(fb), float(rays)

    a, rays_a = run(False)
    b, rays_b = run(True)
    assert np.allclose(a, b, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b).max():.3e}"
    assert rays_a == rays_b


def test_fuse_regen_instanced_sorted(monkeypatch):
    """Fused regen under sorted mode (instanced scene -> cluster backend on
    CPU): the pend state must ride the coherence permute."""
    import jax
    import jax.numpy as jnp

    from hydracore_tpu.integrators.pt_regen import render_passes_regen
    from tests.test_regen import _instanced_scene

    sc = _instanced_scene()

    def run(fuse):
        if fuse:
            monkeypatch.setenv("HYDRA_FUSE_TRACE", "1")
        else:
            monkeypatch.delenv("HYDRA_FUSE_TRACE", raising=False)
        jax.clear_caches()
        fb, _ = render_passes_regen(sc, jnp.uint32(0), jnp.uint32(7),
                                    n_pass=4, max_depth=3)
        return np.asarray(fb)

    a = run(False)
    b = run(True)
    assert np.allclose(a, b, rtol=2e-4, atol=2e-5), \
        f"max abs diff {np.abs(a - b).max():.3e}"
