"""GBuffer evaluation — per-pixel geometric/material layers.

TPU rebuild of the reference gbuffer pass (GPUOCLLayerOther.cpp:694
EvalGBuffer + material.cl:1347 GetGBufferSample): anti-aliased primary rays
per pixel produce depth / world normal / diffuse texcolor / matId / objId /
instId / coverage layers; ids come from the dominant (closest of the
center) sample, scalars are averaged over subsamples (the reference uses
GBUFFER_SAMPLES=64 Hammersley with a median filter; we average a
configurable sample count).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydracore_tpu.bsdf.core import fetch_material
from hydracore_tpu.integrators.pt import compute_hit, make_eye_rays
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import closest_hit


@partial(jax.jit, static_argnames=("n_samples",))
def eval_gbuffer(scene, seed, n_samples: int = 4):
    """Returns a dict of (H, W, ...) layers:
    depth, normal(3), texcolor(3), coverage, mat_id, inst_id, shadow-free.
    """
    cam = scene.camera
    W, H = cam.width, cam.height
    R = W * H
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)

    depth_acc = jnp.zeros((R,), jnp.float32)
    norm_acc = jnp.zeros((R, 3), jnp.float32)
    tex_acc = jnp.zeros((R, 3), jnp.float32)
    cover_acc = jnp.zeros((R,), jnp.float32)
    mat_first = jnp.full((R,), -1, jnp.int32)
    inst_first = jnp.full((R,), -1, jnp.int32)
    t_center = jnp.full((R,), jnp.inf, jnp.float32)

    for s in range(n_samples):
        sample_idx = pix * jnp.uint32(0x9E3779B9) ^ jnp.uint32(s)
        jitter = rng.rand2(sample_idx, 0, 7, seed) if s > 0 else jnp.full((R, 2), 0.5)
        lens = jnp.zeros((R, 2), jnp.float32)
        ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
        t, tri, u, v = closest_hit(scene, ray_o, ray_d)
        hit = tri >= 0
        pos, n, ng, uv, mat_id, tri_light, tang = compute_hit(scene, tri, u, v, ray_o, ray_d, t)
        p = fetch_material(scene, mat_id, uv)
        tri_c = jnp.clip(tri, 0, scene.tri_inst.shape[0] - 1)
        inst = jnp.where(hit, scene.tri_inst[tri_c], -1)

        depth_acc = depth_acc + jnp.where(hit, t, 0.0)
        norm_acc = norm_acc + jnp.where(hit[:, None], n, 0.0)
        tex_acc = tex_acc + jnp.where(hit[:, None], p.diff_color, 0.0)
        cover_acc = cover_acc + hit.astype(jnp.float32)
        if s == 0:  # center sample defines ids + canonical depth
            mat_first = jnp.where(hit, mat_id, -1)
            inst_first = inst
            t_center = jnp.where(hit, t, jnp.inf)

    denom = jnp.maximum(cover_acc, 1.0)
    return {
        "depth": (depth_acc / denom).reshape(H, W),
        "normal": (norm_acc / denom[:, None]).reshape(H, W, 3),
        "texcolor": (tex_acc / denom[:, None]).reshape(H, W, 3),
        "coverage": (cover_acc / n_samples).reshape(H, W),
        "mat_id": mat_first.reshape(H, W),
        "inst_id": inst_first.reshape(H, W),
        "depth_center": t_center.reshape(H, W),
    }
