"""GBuffer evaluation — per-pixel geometric/material layers.

TPU rebuild of the reference gbuffer pass (GPUOCLLayerOther.cpp:694
EvalGBuffer + material.cl:1347 GetGBufferSample): anti-aliased primary rays
per pixel produce depth / world normal / diffuse texcolor / matId / objId /
instId / coverage layers; ids and canonical depth come from the DOMINANT
sample — the subsample whose depth is the per-pixel median (the reference
picks the median-depth sample of GBUFFER_SAMPLES=64 Hammersley the same
way); scalars are averaged over subsamples.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hydracore_tpu.bsdf.core import fetch_material
from hydracore_tpu.integrators.pt import compute_hit, make_eye_rays, shadow_trace
from hydracore_tpu.lights.sampling import sample_light_rev, select_light
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import closest_hit
from hydracore_tpu.utils.math3d import dot3, offs_ray_pos


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
    shadow_acc = jnp.zeros((R,), jnp.float32)
    alpha_acc = jnp.zeros((R,), jnp.float32)
    t_all, mat_all, inst_all = [], [], []

    for s in range(n_samples):
        sample_idx = pix * jnp.uint32(0x9E3779B9) ^ jnp.uint32(s)
        jitter = rng.rand2(sample_idx, 0, 7, seed) if s > 0 else jnp.full((R, 2), 0.5)
        lens = jnp.zeros((R, 2), jnp.float32)
        ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
        t, tri, u, v = closest_hit(scene, ray_o, ray_d)
        hit = tri >= 0
        pos, n, ng, uv, mat_id, tri_light, tang = compute_hit(scene, tri, u, v, ray_o, ray_d, t)
        p = fetch_material(scene, mat_id, uv)
        if scene.settings is not None and getattr(scene.settings, "has_inst", False):
            # instanced scenes: `tri` is a slot id; the slot map's second
            # column is the SYNTHETIC instance row — report the original
            # desc.instances index so objId masks match the flat layout
            # (flattened-world hits carry it per-triangle in tri_inst)
            row = scene.cl_slot_tri2[
                jnp.clip(tri, 0, scene.cl_slot_tri2.shape[0] - 1)]
            tri_c = jnp.clip(row[:, 0], 0, scene.tri_inst.shape[0] - 1)
            orig_kept = scene.inst_orig[
                jnp.clip(row[:, 1], 0, scene.inst_orig.shape[0] - 1)]
            inst = jnp.where(row[:, 1] == 0, scene.tri_inst[tri_c], orig_kept)
            inst = jnp.where(hit, inst, -1)
        else:
            tri_c = jnp.clip(tri, 0, scene.tri_inst.shape[0] - 1)
            inst = jnp.where(hit, scene.tri_inst[tri_c], -1)

        depth_acc = depth_acc + jnp.where(hit, t, 0.0)
        norm_acc = norm_acc + jnp.where(hit[:, None], n, 0.0)
        tex_acc = tex_acc + jnp.where(hit[:, None], p.diff_color, 0.0)
        cover_acc = cover_acc + hit.astype(jnp.float32)
        # shadow layer: NEE occlusion of the first hit (the gray first-
        # bounce shadow the reference packs to pathShadow8B,
        # material.cl:728-735)
        r_l = rng.rand4(sample_idx, 0, 12, seed)
        l_idx, _ = select_light(scene.lights, r_l[:, 3])
        ls = sample_light_rev(scene, l_idx, r_l[:, :3], pos)
        ngs = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)
        sray_o = offs_ray_pos(pos, ngs, ls.dir)
        occ = shadow_trace(scene, sray_o, ls.dir, ls.dist, hit,
                           (r_l[:, 0] * 16777216.0).astype(jnp.uint32),
                           bool(scene.settings.has_alpha)
                           if scene.settings is not None else False)
        shadow_acc = shadow_acc + jnp.where(hit & ~occ, 1.0, 0.0)
        # alpha layer: surface opacity at the hit (PutAlphaToGBuffer
        # analogue, material.cl:1475)
        alpha_acc = alpha_acc + jnp.where(hit, p.opacity, 0.0)
        t_all.append(jnp.where(hit, t, jnp.inf))
        mat_all.append(jnp.where(hit, mat_id, -1))
        inst_all.append(inst)

    # dominant sample = the depth-MEDIAN subsample; ids/canonical depth come
    # from it (GetGBufferSample picks the median-depth sample the same way,
    # material.cl:1347 + CPUExp_GBuffer median filter) — stable on edges
    # where the center sample flickers between foreground and background
    ts = jnp.stack(t_all)  # (S, R), inf on miss -> sorts last
    ts_sorted = jnp.sort(ts, axis=0)
    hits = cover_acc.astype(jnp.int32)
    med_idx = jnp.maximum((hits - 1) // 2, 0)
    t_med = jnp.take_along_axis(ts_sorted, med_idx[None, :], axis=0)[0]
    s_star = jnp.argmin(jnp.abs(ts - t_med[None, :]), axis=0)
    mat_dom = jnp.take_along_axis(jnp.stack(mat_all), s_star[None, :], 0)[0]
    inst_dom = jnp.take_along_axis(jnp.stack(inst_all), s_star[None, :], 0)[0]
    any_hit_px = hits > 0
    mat_dom = jnp.where(any_hit_px, mat_dom, -1)
    inst_dom = jnp.where(any_hit_px, inst_dom, -1)
    t_dom = jnp.where(any_hit_px, t_med, jnp.inf)

    denom = jnp.maximum(cover_acc, 1.0)
    return {
        "depth": (depth_acc / denom).reshape(H, W),
        "normal": (norm_acc / denom[:, None]).reshape(H, W, 3),
        "texcolor": (tex_acc / denom[:, None]).reshape(H, W, 3),
        "coverage": (cover_acc / n_samples).reshape(H, W),
        "shadow": (shadow_acc / denom).reshape(H, W),
        "alpha": (alpha_acc / denom).reshape(H, W),
        "mat_id": mat_dom.reshape(H, W),
        "inst_id": inst_dom.reshape(H, W),
        "depth_center": t_dom.reshape(H, W),
    }


def noise_map(fb_sum, fb_sq_sum, n):
    """Per-pixel relative-variance estimate from accumulated sum and
    sum-of-squares images (the noise extraction the reference's adaptive
    path uses, CPUExp_GBuffer.cpp / CPUExp_Integrators.h:227-234)."""
    mean = fb_sum / jnp.maximum(n, 1.0)
    var = jnp.maximum(fb_sq_sum / jnp.maximum(n, 1.0) - mean * mean, 0.0)
    lum_m = 0.2126 * mean[..., 0] + 0.7152 * mean[..., 1] + 0.0722 * mean[..., 2]
    lum_v = 0.2126 * var[..., 0] + 0.7152 * var[..., 1] + 0.0722 * var[..., 2]
    return jnp.sqrt(lum_v) / jnp.maximum(lum_m, 1e-3)


def render_adaptive(scene, spp_base: int, spp_max: int, seed: int = 777,
                    max_depth: int | None = None, noise_threshold: float = 0.15,
                    tile_pixels: int = 16384):
    """Noise-driven adaptive sampling on top of production tiles: every
    pixel gets spp_base samples; pixels whose noise estimate exceeds the
    threshold get topped up toward spp_max (reference adaptivity:
    MISPTLoop2Adapt + noise spreading, CPUExp_Integrators.h:450/227)."""
    import numpy as np

    from hydracore_tpu.integrators.pt import render_tile_production

    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    scene_d = jax.device_put(scene)
    R = H * W

    # base pass: accumulate sum and sum-of-squares per pixel
    fb = jnp.zeros((R, 3), jnp.float32)
    fb2 = jnp.zeros((R, 3), jnp.float32)
    k = min(max(spp_base, 1), 32)
    rounds = -(-spp_base // k)
    for start in range(0, R, tile_pixels):
        ids = jnp.arange(start, min(start + tile_pixels, R), dtype=jnp.uint32)
        for r in range(rounds):
            c = render_tile_production(scene_d, ids, jnp.uint32(r * k),
                                       jnp.uint32(seed), k, md)
            fb = fb.at[ids].add(c)
            fb2 = fb2.at[ids].add(c * c)
    n_base = float(rounds)
    noise = np.asarray(noise_map(fb.reshape(H, W, 3), fb2.reshape(H, W, 3),
                                 n_base)).reshape(-1)

    # top-up pass for noisy pixels
    counts = np.full(R, n_base, np.float32)
    noisy = np.where(noise > noise_threshold)[0]
    extra_rounds = max(int(np.ceil((spp_max - spp_base) / k)), 0)
    if len(noisy) and extra_rounds > 0:
        pad = (-len(noisy)) % tile_pixels
        noisy_p = np.concatenate([noisy, np.full(pad, noisy[-1])]) if pad else noisy
        for start in range(0, len(noisy_p), tile_pixels):
            ids = jnp.asarray(noisy_p[start:start + tile_pixels].astype(np.uint32))
            for r in range(extra_rounds):
                c = render_tile_production(scene_d, ids,
                                           jnp.uint32((rounds + r) * k),
                                           jnp.uint32(seed), k, md)
                fb = fb.at[ids].add(c)
        # duplicate pad ids receive duplicate adds: count them exactly
        np.add.at(counts, noisy_p, float(extra_rounds))
    img = np.asarray(fb).reshape(H, W, 3) / counts.reshape(H, W, 1)
    return img.astype(np.float32)
