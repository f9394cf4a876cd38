"""Independent LT oracle vs the device LT wavefront.

The existing LT tests pin LT against PT — both run on the SAME jax
bsdf/light library, so a systematic error in the forward-sampling or
camera-connection math shared with SBDPT/IBPT/MMLT could cancel. OracleLT
(integrators/oracle.py) is a scalar numpy light tracer sharing no device
code; agreement here independently pins LightSampleForward (clight.h:1064),
CameraImageToSurfaceFactor (cbidir.h:78) and the splat normalization
(ConnectToEyeKernel, material.cl:147)."""
import numpy as np

from hydracore_tpu.integrators.lt import render_lt
from hydracore_tpu.integrators.oracle import OracleLT
from hydracore_tpu.scene.procedural import SceneBuilder


def _box_scene(w=16, h=12):
    b = SceneBuilder()
    grey = b.lambert([0.65, 0.65, 0.65])
    red = b.lambert([0.7, 0.15, 0.1])
    b.add_box_interior(2.0, grey, grey, grey, red, grey)
    b.rect_light([0, 1.95, 0], 0.7, 0.7, [12.0, 11.0, 9.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=w, height=h, trace_depth=4)


def test_oracle_lt_matches_device_lt():
    sc = _box_scene()
    W, H = sc.camera.width, sc.camera.height
    dev = np.asarray(render_lt(sc, n_passes=64, paths_per_pass=W * H * 16,
                               seed=3, max_depth=4))
    orc = OracleLT(sc).render(n_paths=24000, max_depth=4, seed=8)
    assert np.isfinite(orc).all() and orc.max() > 0
    # overall energy
    rel = abs(dev.mean() - orc.mean()) / max(dev.mean(), 1e-9)
    assert rel < 0.12, f"device={dev.mean():.4f} oracle={orc.mean():.4f}"
    # spatial agreement on 4x4 blocks (robust to per-pixel splat noise)
    db = dev.reshape(H // 4, 4, W // 4, 4, 3).mean(axis=(1, 3, 4))
    ob = orc.reshape(H // 4, 4, W // 4, 4, 3).mean(axis=(1, 3, 4))
    mask = db > 0.05 * db.max()
    rb = np.abs(db - ob)[mask] / np.maximum(db[mask], 1e-9)
    assert np.median(rb) < 0.2, f"block medians differ: {np.median(rb):.3f}"
    # the red wall tints its neighborhood in both
    dc = dev.reshape(-1, 3).sum(axis=0)
    oc = orc.reshape(-1, 3).sum(axis=0)
    assert dc[0] > dc[2] and oc[0] > oc[2]
