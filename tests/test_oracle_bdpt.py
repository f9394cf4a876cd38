"""Per-(s, t) SBDPT strategy agreement: jax wavefront vs the independent
scalar oracle (OracleSBDPT).

The aggregate SBDPT-vs-PT tests (test_bdpt.py) cannot catch a bug that is
symmetric across the shared jax library (reference keeps dedicated CPU
bidir integrators for this, CPUExp_Integrators.h:797-935). Here every
strategy's MIS-weighted image is compared in isolation: both sides
estimate the same weighted integral, so block means must agree within MC
noise."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators import bdpt
from hydracore_tpu.integrators.oracle import OracleSBDPT
from hydracore_tpu.ops import rng
from hydracore_tpu.scene.procedural import SceneBuilder

W = 16


def _cornell():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    red = b.lambert([0.7, 0.15, 0.1])
    b.add_box_interior(2.0, m, m, m, red, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [10.0, 10.0, 10.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=W, height=W, trace_depth=3)


def _device_strategy_images(scene, n_passes, seed, max_depth=3):
    """{(s, t): (H, W, 3)} accumulated per-strategy images."""
    from functools import partial

    from hydracore_tpu.integrators.pt import (_morton_pixel_order,
                                              make_eye_rays)

    cam = scene.camera
    R = W * W
    pix = jnp.asarray(_morton_pixel_order(W, W))
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)

    @partial(jax.jit, static_argnames=())
    def one_pass(pass_idx, seed_):
        sample_idx = pix * jnp.uint32(0x9E3779B9) ^ (
            pass_idx * jnp.uint32(0x85EBCA6B))

        def rand_fn(depth, group):
            return rng.rand4(sample_idx, depth, group, seed_)

        jitter = rng.screen_sample(jnp.broadcast_to(pass_idx, (R,)), pix)
        lens = rng.rand2(sample_idx, 0, bdpt.DG_BD_LENS, seed_)
        ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
        out = bdpt._bdpt_core(scene, ray_o, ray_d, rand_fn,
                              pix.astype(jnp.int32), jnp.float32(R),
                              max_depth, "full", with_labels=True)
        labels = [lbl for lbl, _, _ in out]
        imgs = []
        for _lbl, flat, amt in out:
            imgs.append(jnp.zeros((R, 3), jnp.float32)
                        .at[flat].add(amt, mode="drop"))
        return labels, imgs

    scene = jax.device_put(scene)
    acc = {}
    labels = None
    for i in range(n_passes):
        labels, imgs = one_pass(jnp.uint32(i), jnp.uint32(seed))
        for lbl, im in zip(labels, imgs):
            key = (int(lbl[0]), int(lbl[1]))  # jit wraps ints as arrays
            acc[key] = acc.get(key, 0) + np.asarray(im, np.float64)
    return {lbl: v.reshape(W, W, 3) / n_passes for lbl, v in acc.items()}


def _block(a, n=4):
    w = a.shape[0] // n
    return a.reshape(n, w, n, w, 3).mean(axis=(1, 3))


@pytest.fixture(scope="module")
def strategy_pair():
    sc = _cornell()
    dev = _device_strategy_images(sc, n_passes=192, seed=5)
    oracle = OracleSBDPT(sc)
    return sc, dev, oracle


# the k<=4 strategies with nonzero transport in this scene, tested one by
# one: implicit hit, NEE at both depths, connect-to-eye, inner connection
@pytest.mark.parametrize("s,t", [(0, 2), (1, 2), (1, 3), (2, 1), (2, 2)])
def test_strategy_agrees_with_oracle(strategy_pair, s, t):
    sc, dev, oracle = strategy_pair
    assert (s, t) in dev, f"device evaluated strategies: {sorted(dev)}"
    ref = oracle.render_strategy(s, t, spp=48, seed=23)
    got = dev[(s, t)]
    rb, gb = _block(ref), _block(got)
    mask = rb.mean(-1) > 0.02 * max(ref.mean(), 1e-9)
    if not mask.any():  # strategy carries ~no energy in this scene
        assert got.mean() < max(1e-4, 4.0 * ref.mean())
        return
    rel = np.abs(rb - gb).mean(-1)[mask] / np.maximum(rb.mean(-1)[mask],
                                                      1e-9)
    med = float(np.median(rel))
    tot = abs(got.mean() - ref.mean()) / max(ref.mean(), 1e-12)
    assert tot < 0.15, f"(s={s},t={t}) means: oracle {ref.mean():.5f} " \
                       f"device {got.mean():.5f}"
    assert med < 0.25, f"(s={s},t={t}) median block rel err {med:.3f}"
