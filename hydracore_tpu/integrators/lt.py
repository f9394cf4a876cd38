"""Light tracing (LT): light-emitted paths connected to the camera.

TPU rebuild of the reference forward path (GPUOCLLayerCore.cpp:133
trace1D_Fwd + material.cl:147 ConnectToEyeKernel): per bounce every light
path vertex is connected to the eye with a shadow ray, projected to the
screen, and splatted. The camera importance factor follows
CameraImageToSurfaceFactor (cbidir.h:78): with the image plane at distance
  d_img = H / (2 tan(fov/2))
the surface-to-image measure conversion is
  factor = (d_img / cos_cam)^2 / cos_cam * |cos_x| / dist^2
and each vertex contributes T * f_adj * factor / n_paths to its pixel.

Splatting uses a scatter-add into the flat framebuffer — the dual of the
reference's sorted ContribSampleToScreen (screen.cl:409); one scatter per
pass (not per traversal step) is cheap on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.bsdf.core import (apply_bump, eval_bsdf, fetch_material,
                                     sample_bsdf, scene_feats)
from hydracore_tpu.integrators.pt import DG_BSDF, DG_LIGHT
from hydracore_tpu.lights.sampling import sample_light_fwd, select_light
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import any_hit, closest_hit
from hydracore_tpu.integrators.pt import compute_hit
from hydracore_tpu.utils.math3d import dot3, normalize3, offs_ray_pos

DG_LT_EMIT = 5
DG_LT_BSDF = 6
DG_LT_BLEND = 12  # distinct from DG_BD_* (7-11)


def _world_to_view(cam, p):
    """World point -> view space (camera at origin, looking down -Z)."""
    m = jnp.linalg.inv(cam.mWorldViewInv)  # view matrix
    return p @ m[:3, :3].T + m[:3, 3]


@partial(jax.jit, static_argnames=("max_depth", "n_paths"))
def lt_pass(scene, pass_idx, seed, n_paths: int, max_depth: int = 5):
    """Trace n_paths light subpaths; returns ((H,W,3) splat image for THIS
    pass, paths traced). Accumulate over passes and divide by n_passes."""
    cam = scene.camera
    W, H = cam.width, cam.height
    tan_half = cam.mProjInv[1, 1]  # proj[1,1] = 1/tan(fovy/2)
    d_img = H / (2.0 * tan_half)  # image-plane distance in PIXEL units

    feats = scene_feats(scene)
    pidx = jnp.arange(n_paths, dtype=jnp.uint32)
    sample_idx = pidx * jnp.uint32(0x9E3779B9) ^ (jnp.uint32(pass_idx) * jnp.uint32(0x85EBCA6B))

    r_e = rng.rand4(sample_idx, 0, DG_LT_EMIT, seed)
    l_idx, pick_prob = select_light(scene.lights, r_e[:, 3])
    ls = sample_light_fwd(scene, l_idx, r_e)

    # initial throughput: Le * cos / (pdfA * pdfW * pick)
    T = ls.radiance * (ls.cos_at_light / jnp.maximum(ls.pdf_a * ls.pdf_w * pick_prob, 1e-12))[:, None]
    ray_o = offs_ray_pos(ls.pos, ls.norm, ls.dir)
    ray_d = ls.dir
    alive = jnp.ones((n_paths,), bool)

    fb = jnp.zeros((H * W, 3), jnp.float32)

    # connect at depths 0..max_depth-2 so total path segments (light->x_1..
    # x_{d+1}->cam = d+2) stay within the same budget PT covers (its NEE at
    # depth d yields d+2 segments and stops at max_depth-2 too)
    for depth in range(max_depth - 1):
        t, tri, u, v = closest_hit(scene, ray_o, ray_d, active=alive)
        alive = alive & (tri >= 0)
        pos, n, ng, uv, mat_id, _, tang = compute_hit(scene, tri, u, v, ray_o, ray_d, t)
        p = fetch_material(scene, mat_id, uv, pos, n, wo=-ray_d,
                           u_blend=rng.rand1(sample_idx, depth,
                                             DG_LT_BLEND, seed))
        n = apply_bump(scene, p, n, tang, uv)
        # orient normals toward the incoming side (two-sided shading)
        n = jnp.where(dot3(n, -ray_d)[:, None] >= 0.0, n, -n)
        ng = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)

        # ---- connect to eye (ConnectToEyeKernel semantics)
        to_cam = cam.pos - pos
        dist2 = jnp.maximum(dot3(to_cam, to_cam), 1e-12)
        dist = jnp.sqrt(dist2)
        w_cam = to_cam / dist[:, None]

        pv = _world_to_view(cam, pos)  # view space
        z = -pv[:, 2]
        in_front = z > 1e-4
        sx = pv[:, 0] / jnp.maximum(z, 1e-6) / (tan_half * W / H)
        sy = pv[:, 1] / jnp.maximum(z, 1e-6) / tan_half
        # floor (not int-cast) — truncation toward zero would make the
        # 0-column/row a double-width splat bin
        px = jnp.floor((sx + 1.0) * 0.5 * W).astype(jnp.int32)
        py = jnp.floor((1.0 - sy) * 0.5 * H).astype(jnp.int32)
        on_screen = in_front & (px >= 0) & (px < W) & (py >= 0) & (py < H)

        f_adj, _ = eval_bsdf(p, -ray_d, w_cam, n, feats)
        cos_x = jnp.abs(dot3(w_cam, n))
        cos_cam = jnp.maximum(z / dist, 1e-6)  # angle at the pinhole
        img_factor = (d_img / cos_cam) ** 2 / cos_cam
        factor = img_factor * cos_x / dist2

        can = alive & on_screen & (cos_x > 0)
        sray_o = offs_ray_pos(pos, ng, w_cam)
        occluded = any_hit(scene, sray_o, w_cam, dist * 0.995, active=can)
        contrib = T * f_adj * (factor / n_paths)[:, None]
        contrib = jnp.where((can & ~occluded)[:, None], contrib, 0.0)
        flat = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
        fb = fb.at[flat].add(contrib, mode="drop")

        if depth == max_depth - 2:
            break

        # ---- next bounce
        r_b = rng.rand4(sample_idx, depth, DG_LT_BSDF, seed)
        bs = sample_bsdf(p, -ray_d, n, r_b, feats)
        T = T * bs.weight
        alive = alive & (T.max(axis=-1) > 1e-7)
        n_off = jnp.where(bs.is_transmission[:, None], -ng, ng)
        ray_o = offs_ray_pos(pos, n_off, bs.wi)
        ray_d = bs.wi

    return fb.reshape(H, W, 3), jnp.float32(n_paths)


def render_lt(scene, n_passes: int, paths_per_pass: int | None = None, seed: int = 777,
              max_depth: int | None = None):
    """Accumulate LT passes -> (H, W, 3) estimate of the same image PT
    renders (direct-from-light paths excluded: LT cannot see the camera ray
    hit the emitter; emissive surfaces seen directly are added separately
    by the caller or via a PT pass — ref IBPT combines both)."""
    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    n_paths = paths_per_pass or (W * H)
    scene = jax.device_put(scene)
    fb = jnp.zeros((H, W, 3), jnp.float32)
    for i in range(n_passes):
        img, _ = lt_pass(scene, jnp.uint32(i), jnp.uint32(seed), n_paths, max_depth=md)
        fb = fb + img
    return fb / n_passes
