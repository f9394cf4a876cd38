"""Light tracing vs path tracing consistency + gbuffer sanity.

LT and PT are independent unbiased estimators of the same image (minus
directly-seen emitters, which LT cannot produce) — their converged means
must agree. This is the reference's IBPT-consistency idea as a test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore_tpu.integrators.gbuffer import eval_gbuffer
from hydracore_tpu.integrators.lt import render_lt
from hydracore_tpu.integrators.pt import render
from hydracore_tpu.scene.procedural import SceneBuilder


@pytest.fixture(scope="module")
def box_scene():
    b = SceneBuilder()
    m = b.lambert([0.65, 0.65, 0.65])
    red = b.lambert([0.7, 0.1, 0.1])
    b.add_box_interior(2.0, m, m, m, red, m)
    b.rect_light([0, 1.95, 0], 0.6, 0.6, [12.0, 12.0, 12.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0], width=24, height=24, trace_depth=4)


def test_lt_matches_pt(box_scene):
    sc = box_scene
    pt = np.asarray(render(sc, spp=192, seed=5))
    lt = np.asarray(render_lt(sc, n_passes=48, paths_per_pass=24 * 24 * 8, seed=9))
    # exclude pixels that (even partially) see the emitter directly (LT
    # lacks that path): mask where PT clearly exceeds diffuse levels
    emit_mask = pt.max(axis=-1) > 1.2
    pt_m = np.where(emit_mask[..., None], 0, pt)
    lt_m = np.where(emit_mask[..., None], 0, lt)
    rel = abs(pt_m.mean() - lt_m.mean()) / max(pt_m.mean(), 1e-9)
    assert rel < 0.12, f"LT/PT disagree: pt={pt_m.mean():.4f} lt={lt_m.mean():.4f} rel={rel:.3f}"
    # spatial agreement (coarse): downsample 4x4 blocks
    a = pt_m.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3))
    c = lt_m.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3))
    mask = a.mean(-1) > 0.05
    relmap = np.abs(a - c).mean(-1)[mask] / np.maximum(a.mean(-1)[mask], 1e-9)
    assert np.median(relmap) < 0.25, f"median block error {np.median(relmap)}"


def test_gbuffer_layers(box_scene):
    g = eval_gbuffer(box_scene, jnp.uint32(7), n_samples=2)
    H = W = 24
    assert g["depth"].shape == (H, W)
    depth = np.asarray(g["depth"])
    assert (depth[H // 2, W // 2] > 3.0) and (depth[H // 2, W // 2] < 9.0)
    # back wall normal points toward camera (+z)
    nrm = np.asarray(g["normal"])[H // 2, W // 2]
    assert nrm[2] > 0.9
    cov = np.asarray(g["coverage"])
    assert cov.mean() > 0.95  # closed box fills the frame
    assert np.asarray(g["mat_id"]).max() >= 0


def test_gbuffer_shadow_alpha_layers(box_scene):
    from hydracore_tpu.integrators.gbuffer import eval_gbuffer

    sc = box_scene
    gb = eval_gbuffer(jax.device_put(sc), jnp.uint32(7), n_samples=2)
    assert "shadow" in gb and "alpha" in gb
    sh = np.asarray(gb["shadow"])
    assert sh.min() >= 0.0 and sh.max() <= 1.0
    # an open box lit from the top: most visible pixels are lit
    assert sh.mean() > 0.3


def test_adaptive_sampling_runs(box_scene):
    from hydracore_tpu.integrators.gbuffer import render_adaptive
    from hydracore_tpu.integrators.pt import render

    sc = box_scene
    img = render_adaptive(sc, spp_base=8, spp_max=16, seed=3,
                          noise_threshold=0.1, tile_pixels=256)
    ref = np.asarray(render(sc, spp=32, seed=5))
    rel = abs(img.mean() - ref.mean()) / max(ref.mean(), 1e-9)
    assert rel < 0.2, f"adaptive={img.mean():.4f} ref={ref.mean():.4f}"
