"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §5: sharded QMC streams + psum framebuffer)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators.pt import render, render_pass
from hydracore_tpu.parallel.mesh import (
    make_mesh,
    render_distributed,
    render_pass_pixel_sharded,
    render_pass_sample_sharded,
)
from hydracore_tpu.scene.procedural import SceneBuilder


@pytest.fixture(scope="module")
def small_scene():
    b = SceneBuilder()
    m = b.lambert([0.7, 0.3, 0.3])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [15.0, 15.0, 15.0])
    return b.build(cam_pos=[0, 0, 5.5], cam_lookat=[0, 0, 0], width=16, height=16, trace_depth=3)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_pixel_sharded_matches_single_device(small_scene):
    """Pixel sharding must be bit-identical to the single-chip pass — the
    sample index derivation depends only on (pixel, pass)."""
    mesh = make_mesh()
    ref, _ = render_pass(small_scene, jnp.uint32(0), jnp.uint32(7), max_depth=3)
    shd, _ = render_pass_pixel_sharded(small_scene, jnp.uint32(0), jnp.uint32(7), mesh, 3)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(shd), rtol=1e-6, atol=1e-7)


def test_sample_sharded_is_8x_spp(small_scene):
    """One sample-sharded call == 8 sequential passes with pass offsets."""
    mesh = make_mesh()
    fb8, _ = render_pass_sample_sharded(small_scene, jnp.uint32(0), jnp.uint32(7), mesh, 3)
    acc = jnp.zeros_like(fb8)
    for i in range(8):
        c, _ = render_pass(small_scene, jnp.uint32(i), jnp.uint32(7), max_depth=3)
        acc = acc + c
    np.testing.assert_allclose(np.asarray(fb8), np.asarray(acc / 8), rtol=1e-5, atol=1e-6)


def test_render_distributed_converges(small_scene):
    img = np.asarray(render_distributed(small_scene, spp=16, mode="sample"))
    ref = np.asarray(render(small_scene, spp=16))
    # same estimator family, different sample sets: means must agree closely
    assert abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-6) < 0.1


def test_lt_sharded_matches_sequential_passes(small_scene):
    """One distributed LT call == n_chips sequential lt_pass calls with the
    sharded pass offsets (stream sharding rule pass*n+chip)."""
    from hydracore_tpu.integrators.lt import lt_pass
    from hydracore_tpu.parallel.mesh import render_lt_pass_sharded

    mesh = make_mesh()
    n = mesh.devices.size
    W = small_scene.camera.width * small_scene.camera.height
    fb8, paths = render_lt_pass_sharded(small_scene, jnp.uint32(0),
                                        jnp.uint32(5), mesh, W, 3)
    acc = jnp.zeros_like(fb8)
    for i in range(n):
        img, _ = lt_pass(small_scene, jnp.uint32(i), jnp.uint32(5), W,
                         max_depth=3)
        acc = acc + img
    np.testing.assert_allclose(np.asarray(fb8), np.asarray(acc / n),
                               rtol=1e-5, atol=1e-6)
    assert int(paths) == n * W


def test_lt_distributed_agrees_with_pt(small_scene):
    from hydracore_tpu.parallel.mesh import render_lt_distributed

    lt = np.asarray(render_lt_distributed(small_scene, n_passes=64,
                                          paths_per_pass=16 * 16 * 8, seed=9))
    pt = np.asarray(render(small_scene, spp=64, seed=3))
    emit = pt.max(axis=-1) > 1.2
    a = np.where(emit[..., None], 0, pt).mean()
    b = np.where(emit[..., None], 0, lt).mean()
    assert abs(a - b) / max(a, 1e-9) < 0.15, (a, b)
