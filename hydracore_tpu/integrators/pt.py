"""Wavefront MIS path tracer (PT / MISPT) over megablock ray batches.

TPU-native rebuild of the reference hot loop trace1D_Rev
(hydra_drv/GPUOCLLayerCore.cpp:9-130: Trace → ComputeHit → HitEnvOrLight →
ShadePass(NEE) → NextBounce) with the algorithmic semantics of the CPU
oracle IntegratorMISPT::PathTrace (CPUExp_Integrators_PT.cpp:119-224,
SURVEY.md §8.1):

  * implicit light/env hits weighted by the power heuristic against the
    light-pick pdf (weight 1 after specular bounces),
  * next-event estimation with one light sampled from the pick CDF,
  * path terminates when it lands on an emitter,
  * russian roulette from bounce 3 by throughput (GPU NextBounce applies RR
    for diffBounce>=3, material.cl:931; the CPU oracle omits it).

The bounce loop is a statically-unrolled masked wavefront: all rays advance
in lockstep; dead lanes carry zero throughput. One ray per pixel per pass
("unified sampling") makes framebuffer contribution a reshape — the sorted
contribution machinery (screen.cl:409 ContribSampleToScreen) is only needed
for LT/MMLT style scatter and lands with those transports.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.bsdf.core import (apply_bump, eval_bsdf, fetch_material,
                                     sample_bsdf, scene_feats)
from hydracore_tpu.lights.sampling import (
    env_radiance,
    light_eval_pdf_from_hit,
    sample_light_rev,
    select_light,
)
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import (any_hit, any_hit_sorted,
                                          closest_hit, closest_hit_sorted)
from hydracore_tpu.scene.lights import LIGHT_SKY
from hydracore_tpu.utils.math3d import (cross3, dot3,
                                         make_orthonormal_basis, normalize3,
                                         offs_ray_pos)

# rng dimension groups per bounce (role analogue of QMC_VAR_* slots)
DG_LENS = 0
DG_BSDF = 1
DG_LIGHT = 2
DG_RR = 3
DG_ALPHA = 4  # col 0: stochastic alpha; col 1: blend-tree walk
DG_SSS = 5  # subsurface medium events
DG_AO = 6  # proc-tex AO probe directions


def hg_sample(d, g, e1, e2):
    """Henyey-Greenstein phase direction about d — SampleHenyeyGreenstein
    (CPUExp_IntegratorSSS.cpp:110)."""
    from hydracore_tpu.utils.math3d import make_orthonormal_basis

    s = 1.0 - 2.0 * e1
    denom = jnp.maximum((1.0 + g * s) * (1.0 + g * s), 1e-6)
    cost = (s + 2.0 * g * g * g * (e1 - 1.0) * e1 + g * g * s
            + 2.0 * g * (1.0 - e1 + e1 * e1)) / denom
    cost = jnp.clip(cost, -1.0, 1.0)
    sint = jnp.sqrt(jnp.maximum(1.0 - cost * cost, 1e-6))
    t, b = make_orthonormal_basis(d)
    phi = 2.0 * np.pi * e2
    return (jnp.cos(phi) * sint)[:, None] * t + (jnp.sin(phi) * sint)[:, None] * b \
        + cost[:, None] * d


INV_PI_F = float(1.0 / np.pi)


def mis_weight(a, b):
    """Power heuristic (beta=2) — misWeightHeuristic in the reference."""
    a2 = a * a
    return jnp.where(a2 + b * b > 0.0, a2 / (a2 + b * b), 0.0)


def permute_rows_exact(packed, perm):
    """Row-permute a (R, C) f32 matrix through a bf16-BIT-PAIR gather:
    bitcast every f32 lane to two bf16 lanes (pure bit movement — exact
    round-trip for every bit pattern incl. bitcast ints), gather the
    (R, 2C) bf16 rows, bitcast back. Half the bytes of the f32 row gather:
    2.96 -> 0.96 ms per 256k x 17 permute (tools/exp_gather_fuse.py,
    HYDRA_PERM_BF16=0 falls back to the plain gather)."""
    if _os.environ.get("HYDRA_PERM_BF16", "1") != "1":
        return packed[perm]
    R, C = packed.shape
    b = jax.lax.bitcast_convert_type(packed, jnp.bfloat16).reshape(R, 2 * C)
    return jax.lax.bitcast_convert_type(
        b[perm].reshape(R, C, 2), jnp.float32)


MAX_ALPHA_SHADOW_STEPS = 2  # transparent layers a shadow ray may cross

AO_PROBES = 4  # hemisphere probes per hit (MakeAORaysPacked4 analogue)


def ao_probe(scene, pos, n, ng, ao_type, ao_len, need, r_ao):
    """Hemisphere-occlusion input for AO proc-texes (MakeAORays packed
    probes -> surfHit.ao, light.cl:274-457 + texproc.cl:152): AO_PROBES
    cosine-weighted rays of length ao_len about +n ('up'/'both') or -n
    ('down'), averaged unoccluded fraction. One fused (K*R) any-hit."""
    R = pos.shape[0]
    o_list, d_list = [], []
    for k in range(AO_PROBES):
        # 'down' flips the hemisphere; 'both' (AO_TYPE_BOTH) alternates
        # probes between the two sides
        down = ((ao_type == 2) | ((ao_type == 3) & bool(k & 1)))[:, None]
        nh = jnp.where(down, -n, n)
        ngh = jnp.where(down, -ng, ng)
        t_, b_ = make_orthonormal_basis(nh)
        # golden-ratio rotations stretch 2 uniforms over K probes
        u1 = (r_ao[:, 0] + k * 0.618034) % 1.0
        u2 = (r_ao[:, 1] + k * 0.381966) % 1.0
        ct = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
        st = jnp.sqrt(jnp.clip(1.0 - u1, 0.0, 1.0))
        ph = 2.0 * np.pi * u2
        d = (st * jnp.cos(ph))[:, None] * t_ \
            + (st * jnp.sin(ph))[:, None] * b_ + ct[:, None] * nh
        o_list.append(offs_ray_pos(pos, ngh, d))
        d_list.append(d)
    O = jnp.concatenate(o_list, axis=0)
    D = jnp.concatenate(d_list, axis=0)
    occ = any_hit_sorted(scene, O, D,
                         jnp.tile(jnp.maximum(ao_len, 1e-5), AO_PROBES),
                         active=jnp.tile(need, AO_PROBES))
    occ = occ.reshape(AO_PROBES, R)
    ao = 1.0 - occ.astype(jnp.float32).mean(axis=0)
    return jnp.where(need, ao, 1.0)


def shadow_trace(scene, sray_o, sdir, dist, active, u_alpha, has_alpha: bool,
                 presorted: bool = False):
    """Occlusion query. With alpha materials in the scene, walks up to
    MAX_ALPHA_SHADOW_STEPS stochastic transparent layers (ref: shadow
    traversal alpha variants, trace.cl:244+ / TransparentShadowKenrel).
    presorted: the wavefront is already in coherence order — skip the
    internal sort."""
    if not has_alpha:
        if presorted:
            return any_hit(scene, sray_o, sdir, dist * 0.995, active=active)
        return any_hit_sorted(scene, sray_o, sdir, dist * 0.995, active=active)

    from hydracore_tpu.ops.trace_api import (alpha_layer_hit, any_hit_opaque,
                                             has_shadow_split)

    if has_shadow_split(scene):
        # split sets (scene._build_shadow_split): ONE opaque any-hit walk
        # (alpha lanes degenerate in the shadow pool) + stochastic layers
        # over the small dense alpha set — occlusion by opaque vs alpha
        # surfaces is order-independent, so the split is exact
        occluded = any_hit_opaque(scene, sray_o, sdir, dist * 0.995,
                                  active=active, presorted=presorted)
        searching = active & ~occluded
        t_lo = jnp.full(sray_o.shape[0], 1e-5, jnp.float32)
        t_hi = dist * 0.995
        for step in range(MAX_ALPHA_SHADOW_STEPS + 1):
            t, tri, u, v = alpha_layer_hit(scene, sray_o, sdir, t_lo, t_hi,
                                           searching)
            hit = searching & (tri >= 0)
            if step == MAX_ALPHA_SHADOW_STEPS:  # out of layers: opaque
                return occluded | hit
            pos_d, n_d, ng_d, uv, mat_id, _, _ = compute_hit(
                scene, tri, u, v, sray_o, sdir, t)
            ub = rng.hash_u32(u_alpha ^ jnp.uint32(0xB5297A4D)
                              + jnp.uint32(step * 0x68E31DA4))
            ub = (ub >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
            p = fetch_material(scene, mat_id, uv, u_blend=ub)
            ua = rng.hash_u32(u_alpha + jnp.uint32(step * 0x9E3779B9))
            ua = (ua >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
            skip_sh = p.skip_shadow != 0
            passthru = hit & (((p.opacity < 0.999) & (ua >= p.opacity))
                              | skip_sh)
            occluded = occluded | (hit & ~passthru)
            searching = passthru
            t_lo = t + 1e-4
        return occluded

    occluded = jnp.zeros(sray_o.shape[0], bool)
    searching = active
    o = sray_o
    d_left = dist * 0.995
    for step in range(MAX_ALPHA_SHADOW_STEPS + 1):
        t, tri, u, v = closest_hit(scene, o, sdir, t_max=d_left, active=searching)
        hit = searching & (tri >= 0)
        if step == MAX_ALPHA_SHADOW_STEPS:  # out of layers: treat as opaque
            occluded = occluded | hit
            break
        pos, n, ng, uv, mat_id, _, _ = compute_hit(scene, tri, u, v, o, sdir, t)
        ub = rng.hash_u32(u_alpha ^ jnp.uint32(0xB5297A4D)
                          + jnp.uint32(step * 0x68E31DA4))
        ub = (ub >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
        p = fetch_material(scene, mat_id, uv, u_blend=ub)
        ua = rng.hash_u32(u_alpha + jnp.uint32(step * 0x9E3779B9))
        ua = (ua >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
        skip_sh = p.skip_shadow != 0
        passthru = hit & (((p.opacity < 0.999) & (ua >= p.opacity)) | skip_sh)
        occluded = occluded | (hit & ~passthru)
        searching = passthru
        o = pos + sdir * 1e-4
        d_left = jnp.maximum(d_left - t - 1e-4, 0.0)
    return occluded


# ----------------------------------------------------------------------------
# Eye rays (screen.cl MakeEyeRaysQMC semantics: NDC unproject + DOF)
# ----------------------------------------------------------------------------

def make_eye_rays(cam, px, py, jitter, lens_uv):
    """px, py: (R,) int pixel coords; jitter: (R,2) in [0,1); lens_uv (R,2)."""
    W, H = cam.width, cam.height
    x = (px.astype(jnp.float32) + jitter[:, 0]) / W * 2.0 - 1.0
    # image row 0 is the TOP of the frame (PNG convention) -> NDC y = +1
    y = 1.0 - (py.astype(jnp.float32) + jitter[:, 1]) / H * 2.0
    ndc = jnp.stack([x, y, jnp.zeros_like(x), jnp.ones_like(x)], -1)
    pv = ndc @ cam.mProjInv.T
    d_view = normalize3(pv[:, :3] / jnp.maximum(jnp.abs(pv[:, 3:4]), 1e-12))
    # view space: camera at origin looking down -Z
    d_world = normalize3(d_view @ cam.mWorldViewInv[:3, :3].T)
    o_world = jnp.broadcast_to(cam.pos, d_world.shape)

    # thin-lens DOF (MakeEyeRay DOF path): jitter origin on lens disc,
    # re-aim at the focal plane point
    r = jnp.sqrt(jnp.clip(lens_uv[:, 0], 0.0, 1.0)) * cam.lens_radius
    phi = 2.0 * np.pi * lens_uv[:, 1]
    focus_t = cam.focal_dist / jnp.maximum(-d_view[:, 2], 1e-6)
    p_focus = o_world + focus_t[:, None] * d_world
    right = cam.mWorldViewInv[:3, 0]
    up = cam.mWorldViewInv[:3, 1]
    o_dof = o_world + (r * jnp.cos(phi))[:, None] * right + (r * jnp.sin(phi))[:, None] * up
    d_dof = normalize3(p_focus - o_dof)
    use_dof = cam.lens_radius > 0.0
    return jnp.where(use_dof, o_dof, o_world), jnp.where(use_dof, d_dof, d_world)


# ----------------------------------------------------------------------------
# Hit shading data (trace.cl ComputeHit semantics)
# ----------------------------------------------------------------------------

def compute_hit(scene, tri, u, v, ray_o, ray_d, t):
    """Hit attribute interpolation — ONE packed tri_attr row gather (XLA
    gathers cost per-OP on TPU, tools/exp_gather.py; the naive SoA form was
    15 gathers ≈ 24 ms per bounce at 512²).

    Instanced scenes (settings.has_inst): `tri` is the cluster SLOT id;
    it resolves to (mesh tri, instance) through cl_slot_tri2 (the gather
    the traversal epilogue already issued — CSE'd), attributes interpolate
    in mesh-local space and rotate to world by the instance matrix
    (normals by invM^T, tangents by M — BVH4InstTraverse's local-space hit
    semantics, ctrace.h:940-1010)."""
    has_inst = scene.settings is not None and getattr(scene.settings, "has_inst", False)
    if has_inst:
        from hydracore_tpu.ops.gather import gather_rows

        row = scene.cl_slot_tri2[jnp.clip(tri, 0, scene.cl_slot_tri2.shape[0] - 1)]
        tri_c = jnp.clip(row[:, 0], 0, scene.tri_attr.shape[0] - 1)
        im = gather_rows(scene.inst_attr, row[:, 1])
    else:
        tri_c = jnp.clip(tri, 0, scene.tri_attr.shape[0] - 1)
    a = scene.tri_attr[tri_c]  # (R, 40)
    w = 1.0 - u - v
    wc, uc, vc = w[:, None], u[:, None], v[:, None]
    pos = ray_o + t[:, None] * ray_d  # world in both modes (world-t rays)
    n = wc * a[:, 9:12] + uc * a[:, 12:15] + vc * a[:, 15:18]
    ng = cross3(a[:, 3:6], a[:, 6:9])
    tang = wc * a[:, 18:21] + uc * a[:, 21:24] + vc * a[:, 24:27]
    if has_inst:
        def rot_normal(v3):  # v @ invR == invR^T action (rows 12:24 = invM)
            return jnp.stack([
                v3[:, 0] * im[:, 12] + v3[:, 1] * im[:, 16] + v3[:, 2] * im[:, 20],
                v3[:, 0] * im[:, 13] + v3[:, 1] * im[:, 17] + v3[:, 2] * im[:, 21],
                v3[:, 0] * im[:, 14] + v3[:, 1] * im[:, 18] + v3[:, 2] * im[:, 22],
            ], axis=1)

        def rot_vec(v3):  # R v (rows 0:12 = M)
            return jnp.stack([
                v3[:, 0] * im[:, 0] + v3[:, 1] * im[:, 1] + v3[:, 2] * im[:, 2],
                v3[:, 0] * im[:, 4] + v3[:, 1] * im[:, 5] + v3[:, 2] * im[:, 6],
                v3[:, 0] * im[:, 8] + v3[:, 1] * im[:, 9] + v3[:, 2] * im[:, 10],
            ], axis=1)

        n = rot_normal(n)
        ng = rot_normal(ng)
        tang = rot_vec(tang)
    n = normalize3(n)
    ng = normalize3(ng)
    # orient geometric normal with the shading normal
    ng = jnp.where(dot3(ng, n)[:, None] < 0.0, -ng, ng)
    uv = wc * a[:, 27:29] + uc * a[:, 29:31] + vc * a[:, 31:33]
    tang = normalize3(tang)
    mat = a[:, 33].astype(jnp.int32)
    lgt = a[:, 34].astype(jnp.int32)
    return pos, n, ng, uv, mat, lgt, tang


# ----------------------------------------------------------------------------
# The bounce loop
# ----------------------------------------------------------------------------

def pt_trace_impl(scene, ray_o, ray_d, rand_fn, max_depth: int = 5, min_rr_depth: int = 3,
                  has_alpha: bool = False, sample_idx=None):
    """Trace a batch of primary rays to completion with a pluggable random
    provider (hash-RNG for PT, primary-sample-vector slices for PSSMLT).

    Two wavefront modes:
      * legacy (sample_idx None): rays stay in caller order; traversal
        sorts/unsorts internally per call (closest_hit_sorted). Used by
        PSSMLT whose random provider is positional.
      * persistent-sorted (sample_idx given, cluster backend): the WHOLE
        live state is permuted by the coherence key once per bounce and
        both traversals run on the already-sorted wavefront — one sort +
        ONE packed-state gather per bounce instead of 2 sorts + ~7
        gathers/scatters. rand_fn then takes the per-ray stream id:
        rand_fn(sidx, depth, group). Output order is restored at the end.

    Returns (radiance (R,3), rays_traced ()) — the ray counter feeds the
    Mrays/s metric (MRaysStat analogue, cglobals.h:1764)."""
    from hydracore_tpu.ops.trace_api import ray_sort_key, wants_sorted_rays

    R = ray_o.shape[0]
    sorted_mode = sample_idx is not None and wants_sorted_rays(scene)
    if sample_idx is not None:
        hash_fn = rand_fn

        def rand_fn(depth, group):  # noqa: F811 — bind current stream ids
            return hash_fn(sidx, depth, group)

    sidx = sample_idx
    orig_pos = jnp.arange(R, dtype=jnp.int32)
    rays_traced = jnp.zeros((), jnp.float32)
    acc = jnp.zeros((R, 3), jnp.float32)
    throughput = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones((R,), bool)
    prev_pdf = jnp.zeros((R,), jnp.float32)  # bsdf pdf of previous bounce
    prev_spec = jnp.ones((R,), bool)  # camera vertex counts as specular

    feats = scene_feats(scene)
    # static sky gate: closed scenes (no sky light) drop the whole env
    # machinery from the jit graph (finalize_scene sets settings.has_sky)
    has_sky_s = scene.settings is None or scene.settings.has_sky
    # static caustics gate (method_caustic == none -> HRT_ENABLE_PT_CAUSTICS
    # off): PT drops implicit light hits reached through a caustic-casting
    # (specular) bounce once the path has diffused — that transport belongs
    # to the secondary/caustic method (material.cl:526, cbidir.h:524)
    pt_caustics = (scene.settings is None
                   or getattr(scene.settings, "pt_caustics", True))
    if not pt_caustics:
        diff_bounce = jnp.zeros((R,), jnp.int32)
    # static render-layer gate (HRT_DIRECT_LIGHT_MODE/HRT_INDIRECT_LIGHT_MODE
    # kill rules, material.cl:953-955 + :544): 'direct' keeps emission on
    # short/specular-only paths + NEE at the first non-specular vertex;
    # 'indirect' keeps the complement. Deviation from the reference: its
    # indirect NEE kill is bounce-0-only, double-counting mirror-seen direct
    # light across the two layers — we kill specular-only chains too so that
    # direct + indirect == color EXACTLY (tested).
    layer = (getattr(scene.settings, "render_layer", "color")
             if scene.settings is not None else "color")
    if layer != "color":
        spec_only = jnp.ones((R,), bool)  # flagsHaveOnlySpecular analogue
    # static back-plate gate (sky <back>): camera-visible rays (primary or
    # behind pure transmission) take the second-env color instead
    # (environmentColorExtended, cbidir.h:619-625)
    has_back = (scene.settings is not None
                and getattr(scene.settings, "has_env_back", False))
    if has_back:
        pure_t = jnp.ones((R,), bool)  # no D/G/reflect event yet
    # static SSS gate: medium state + random-walk code only when the scene
    # has subsurface materials (SSSMaterial / CPUExp_IntegratorSSS.cpp)
    has_sss = scene.settings is not None and getattr(scene.settings, "has_sss", False)
    if has_sss:
        in_med = jnp.zeros((R,), bool)
        med_sig_s = jnp.zeros((R,), jnp.float32)
        med_sig_a = jnp.zeros((R, 3), jnp.float32)
        med_g = jnp.zeros((R,), jnp.float32)
    # static thick-glass fog gate (attenuationStep, cmaterial.h:2787-2827):
    # rgb = armed fog color, w = fog multiplier (0 = ray outside any fog)
    has_fog = scene.settings is not None and getattr(scene.settings, "has_fog", False)
    if has_fog:
        fog_state = jnp.zeros((R, 4), jnp.float32)
    # static proc-tex AO gate (MakeAORays -> surfHit.ao input channel)
    has_proc_ao = (scene.settings is not None
                   and getattr(scene.settings, "has_proc_ao", False))
    if has_sky_s:
        has_sky = (scene.lights.ltype == LIGHT_SKY).any()
        sky_row = jnp.argmax(scene.lights.ltype == LIGHT_SKY)
        sky_pick = jnp.where(
            has_sky,
            scene.lights.pick_cdf[sky_row + 1] - scene.lights.pick_cdf[sky_row],
            1.0,
        )

    # re-sort cadence A/B knob: 1 = every bounce (default); N sorts on
    # bounces 1, 1+N, … and lets coherence decay in between (results are
    # order-independent — the permute is perf-only). Read at TRACE time and
    # baked into the jit cache: A/B runs must use separate processes (the
    # bench subprocs do) — an in-process env flip hits the cached program.
    sort_every = int(_os.environ.get("HYDRA_SORT_EVERY", "1"))

    # fused-traversal knob (HYDRA_FUSE_TRACE=1): defer the NEE contribution
    # one bounce and trace bounce d's shadow rays TOGETHER with bounce d+1's
    # extension rays in ONE 2R-wide closest-hit dispatch — max_depth kernel
    # invocations per path instead of 2*max_depth-1. Occlusion via closest
    # hit under a per-ray t_max is the same predicate any_hit evaluates
    # (hit exists within range), and the per-lane accumulation order
    # (emit_d, nee_d, emit_{d+1}, …) is preserved exactly, so images are
    # bit-identical. The reference fuses the other way around (dedicated
    # cheap shadow variants, trace.cl:244+); on TPU the fixed per-kernel
    # dispatch cost dominates small scenes, so fewer, wider dispatches win.
    # Alpha scenes keep the multi-step shadow walk (unfused).
    fuse = (not has_alpha) and _os.environ.get("HYDRA_FUSE_TRACE") == "1"
    pend = None  # (sray_o, sdir, sdist, masked contrib, shadow-active)

    for depth in range(max_depth):
        if sorted_mode and depth > 0 and (depth - 1) % sort_every == 0:
            # permute the whole live state into (octant, origin-Morton)
            # coherence order: ONE u32 sort + ONE packed (R,17) gather
            key = ray_sort_key(scene, ray_o, ray_d)
            key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
            _, perm = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
            f32 = jnp.float32
            packed = jnp.concatenate([
                ray_o, ray_d, throughput, acc,
                prev_pdf[:, None], prev_spec.astype(f32)[:, None],
                alive.astype(f32)[:, None],
                jax.lax.bitcast_convert_type(sidx, f32)[:, None],
                jax.lax.bitcast_convert_type(orig_pos, f32)[:, None],
            ], axis=1)
            packed = permute_rows_exact(packed, perm)
            ray_o, ray_d = packed[:, 0:3], packed[:, 3:6]
            throughput, acc = packed[:, 6:9], packed[:, 9:12]
            prev_pdf = packed[:, 12]
            prev_spec = packed[:, 13] > 0.5
            alive = packed[:, 14] > 0.5
            sidx = jax.lax.bitcast_convert_type(packed[:, 15], jnp.uint32)
            orig_pos = jax.lax.bitcast_convert_type(packed[:, 16], jnp.int32)
            if has_back:
                pure_t = pure_t[perm]
            if has_sss:  # medium state rides the same permute
                med = jnp.concatenate([
                    in_med.astype(f32)[:, None], med_sig_s[:, None],
                    med_sig_a, med_g[:, None]], axis=1)
                med = permute_rows_exact(med, perm)
                in_med = med[:, 0] > 0.5
                med_sig_s = med[:, 1]
                med_sig_a = med[:, 2:5]
                med_g = med[:, 5]
            if has_fog:
                fog_state = permute_rows_exact(fog_state, perm)
            if not pt_caustics:
                diff_bounce = diff_bounce[perm]
            if layer != "color":
                spec_only = spec_only[perm]
            if pend is not None:  # pending shadow rays ride the permute
                po, pd, pdist, pcontrib, pmask = pend
                pp = jnp.concatenate([
                    po, pd, pdist[:, None], pcontrib,
                    pmask.astype(f32)[:, None]], axis=1)
                pp = permute_rows_exact(pp, perm)
                pend = (pp[:, 0:3], pp[:, 3:6], pp[:, 6], pp[:, 7:10],
                        pp[:, 10] > 0.5)

        rays_traced = rays_traced + alive.sum()
        # primaries arrive Morton-ordered; in sorted mode the wavefront is
        # already coherent, otherwise the traversal sorts internally
        # (screen.cl:155 Morton z-index sort analogue)
        if sorted_mode:
            trace = partial(closest_hit,
                            kind="primary" if depth == 0 else "bounce")
        else:
            trace = closest_hit if depth == 0 else closest_hit_sorted
        if pend is not None:
            # one 2R dispatch: [extension rays; pending shadow rays]
            po, pd, pdist, pcontrib, pmask = pend
            R1 = ray_o.shape[0]
            t2, tri2, u2, v2 = trace(
                scene,
                jnp.concatenate([ray_o, po]),
                jnp.concatenate([ray_d, pd]),
                t_max=jnp.concatenate(
                    [jnp.full((R1,), 1e30, jnp.float32), pdist * 0.995]),
                active=jnp.concatenate([alive, pmask]))
            t, tri, u, v = t2[:R1], tri2[:R1], u2[:R1], v2[:R1]
            # NEE lands BEFORE this bounce's env/emit — the same per-lane
            # order as the unfused loop (emit_{d-1}, nee_{d-1}, emit_d)
            occluded_p = tri2[R1:] >= 0
            acc = acc + jnp.where(occluded_p[:, None], 0.0, pcontrib)
            pend = None
        else:
            t, tri, u, v = trace(scene, ray_o, ray_d, active=alive)
        hit = alive & (tri >= 0)
        miss = alive & ~hit

        # ---- thick-glass Beer fog over the segment just traced
        # (attenuationStep: T = exp(-max(1-fogColor,0)*fogMult*dist),
        # cmaterial.h:2787); misses stay unattenuated like the reference
        if has_fog:
            fog_on = hit & (fog_state[:, 3] > 0.0)
            seg = jnp.where(jnp.isfinite(t), t, 0.0)
            att = jnp.exp(-jnp.maximum(1.0 - fog_state[:, 0:3], 0.0)
                          * (fog_state[:, 3] * seg)[:, None])
            throughput = jnp.where(fog_on[:, None], throughput * att,
                                   throughput)

        # ---- subsurface medium walk (ref PathTraceVol,
        # CPUExp_IntegratorSSS.cpp:143): rays inside an SSS medium sample a
        # scatter distance ~ exp(sigma_s); a scatter event consumes this
        # wavefront step (new HG direction, Beer-Lambert absorption) and
        # skips all surface logic below.
        if has_sss:
            r_m = rand_fn(depth, DG_SSS)
            t_srf = jnp.where(jnp.isfinite(t), t, jnp.float32(3e38))
            d_scat = -jnp.log(jnp.maximum(r_m[:, 0], 1e-12)) \
                / jnp.maximum(med_sig_s, 1e-12)
            scat = alive & in_med & (med_sig_s > 0.0) & (d_scat < t_srf) & hit
            d_abs = jnp.where(scat, d_scat, jnp.minimum(t_srf, 3e38))
            att = jnp.exp(-med_sig_a * d_abs[:, None])
            throughput = jnp.where((alive & in_med & hit | scat)[:, None],
                                   throughput * att, throughput)
            pos_scat = ray_o + d_scat[:, None] * ray_d
            hg_dir = normalize3(hg_sample(ray_d, med_g, r_m[:, 1], r_m[:, 2]))
            alive = alive & ~(in_med & miss)  # lost inside the medium
            miss = miss & ~in_med
        else:
            scat = jnp.zeros_like(alive)

        # ---- environment (HitEnvOrLightKernel env path, material.cl:344)
        if has_sky_s:
            from hydracore_tpu.lights.envmap import env_pdf_for_dir

            env = env_radiance(scene, ray_d)
            env_pdf = env_pdf_for_dir(scene.env_rows_cdf, scene.env_cols_cdf,
                                      scene.env_pdf_uv, ray_d)
            w_env = jnp.where(
                prev_spec | ~has_sky,
                1.0,
                mis_weight(prev_pdf, env_pdf * sky_pick),
            )
            env_c = env * w_env[:, None]
            if has_back:
                from hydracore_tpu.lights.sampling import env_back_radiance

                # back plate REPLACES the env color (unweighted) for
                # camera-visible rays (cbidir.h:624)
                env_c = jnp.where(pure_t[:, None],
                                  env_back_radiance(scene, ray_d), env_c)
            if layer != "color":  # sky emission splits like light emission
                keep_em = spec_only | (depth <= 1)
                if layer == "indirect":
                    keep_em = ~keep_em
                env_c = jnp.where(keep_em[:, None], env_c, 0.0)
            acc = acc + jnp.where(miss[:, None], throughput * env_c, 0.0)
        alive = alive & hit

        pos, n, ng, uv, mat_id, tri_light, tang = compute_hit(scene, tri, u, v, ray_o, ray_d, t)
        r_a = rand_fn(depth, DG_ALPHA)
        ao_val = None
        if has_proc_ao:  # static gate: AO probes only when a proc-tex asks
            from hydracore_tpu.scene import materials as MC

            from hydracore_tpu.ops.gather import gather_rows

            arow = gather_rows(scene.mat_attr, mat_id)
            ao_t = arow[:, MC.MA_AO_TYPE].astype(jnp.int32)
            rays_traced = rays_traced + (alive & (ao_t > 0)).sum() * AO_PROBES
            ao_val = ao_probe(scene, pos, n, ng, ao_t,
                              arow[:, MC.MA_AO_LENGTH],
                              alive & (ao_t > 0), rand_fn(depth, DG_AO))
        p = fetch_material(scene, mat_id, uv, pos, n, wo=-ray_d,
                           u_blend=r_a[:, 1], ao=ao_val)
        n = apply_bump(scene, p, n, tang, uv)

        # ---- stochastic alpha transparency (ref: alpha-tested traversal
        # BVH4InstTraverseAlphaS + NextTransparentBounce, material.cl:1080):
        # with prob (1 - opacity) the surface is skipped — the ray passes
        # through unchanged. Passing through consumes one wavefront step
        # (the reference loops transparent bounces inside the kernel).
        u_a = r_a[:, 0]
        passthru = alive & (p.opacity < 0.999) & (u_a >= p.opacity) & ~scat

        # ---- fused light-row gather: the implicit-hit MIS eval (by the hit
        # tri's light id) and the NEE sample (by the CDF pick) share ONE
        # light_attr gather over 2R concatenated indices — gathers cost
        # per-OP on this TPU (tools/exp_gather.py). Drawing DG_LIGHT here
        # instead of below is value-identical (counter-based RNG).
        nee = depth < max_depth - 1
        lrow = jnp.clip(tri_light, 0, scene.lights.ltype.shape[0] - 1)
        rows_hit = rows_nee = l_idx = r_l = None
        if nee:
            r_l = rand_fn(depth, DG_LIGHT)
            l_idx, _ = select_light(scene.lights, r_l[:, 3])
        if scene.light_attr.shape[0] > 1:
            from hydracore_tpu.ops.gather import gather_rows

            if nee:
                rows2 = gather_rows(scene.light_attr,
                                    jnp.concatenate([lrow, l_idx]))
                rows_hit, rows_nee = rows2[:R], rows2[R:]
            else:
                rows_hit = gather_rows(scene.light_attr, lrow)

        # ---- implicit emitter hit (HitEnvOrLightKernel light path :510)
        em_lum = p.em_color.max(axis=-1)
        is_emitter = alive & (em_lum > 1e-6) & ~passthru & ~scat
        front = dot3(n, -ray_d) > 0.0
        l_pdf_w, l_pick = light_eval_pdf_from_hit(scene, lrow, ray_o, ray_d,
                                                  pos, n, return_pick=True,
                                                  rows=rows_hit)
        w_li = jnp.where(
            prev_spec | (tri_light < 0), 1.0, mis_weight(prev_pdf, l_pdf_w * l_pick)
        )
        emit = jnp.where(
            (is_emitter & front)[:, None], throughput * p.em_color * w_li[:, None], 0.0
        )
        if not pt_caustics:
            # disableCaustics kill (material.cl:521-531): after >=1 diffuse
            # bounce, an implicit hit whose PREVIOUS bounce was specular
            # (the reference's materialCastCaustics default) is a caustic —
            # zero it so the caustic method renders it instead
            emit = jnp.where(((diff_bounce > 0) & prev_spec)[:, None],
                             0.0, emit)
        if layer != "color":
            # emission belongs to the DIRECT layer on short (<=1 bounce) or
            # specular-only paths (material.cl:543-544 kill, inverted)
            keep_em = spec_only | (depth <= 1)
            if layer == "indirect":
                keep_em = ~keep_em
            emit = jnp.where(keep_em[:, None], emit, 0.0)
        acc = acc + emit
        alive = alive & ~is_emitter  # the path ends on emitters (ref :134-146)

        if depth == max_depth - 1:
            break

        # ---- NEE (ShadePass: LightSample → ShadowTrace → Shade)
        # shade with the viewer-oriented normal: materials are two-sided for
        # reflection (the reference combines brdf/btdf by hemisphere,
        # material.cl:737; flipping matches its diffuse behavior)
        ns = jnp.where(dot3(n, -ray_d)[:, None] >= 0.0, n, -n)
        ngs = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)
        ls = sample_light_rev(scene, l_idx, r_l[:, :3], pos, rows=rows_nee)
        pick_prob = ls.pick_prob  # from the packed row (saves 2 CDF gathers)
        sray_o = offs_ray_pos(pos, ngs, ls.dir)
        f, pdf_fwd = eval_bsdf(p, -ray_d, ls.dir, ns, feats)
        # two-sided combine (ref material.cl:737-740: brdf*max(+cos,0) +
        # btdf*max(-cos,0)) — eval_bsdf already zeroes f by hemisphere, so
        # |cos| credits transmission lobes (translucency, rough glass, SSS)
        cos_s = jnp.abs(dot3(ls.dir, ns))
        w_l = jnp.where(ls.is_delta, 1.0, mis_weight(ls.pdf_w * pick_prob, pdf_fwd))
        contrib = (
            throughput
            * f
            * ls.radiance
            * (cos_s * w_l / jnp.maximum(ls.pdf_w * pick_prob, 1e-12))[:, None]
        )
        ok = alive & (cos_s > 0.0) & ~passthru & ~scat
        if layer != "color":
            # NEE at the first vertex (or through a pure specular chain) is
            # direct light (killDueToDirectLight/IndirectLight inverted)
            keep_nee = spec_only | (depth == 0)
            if layer == "indirect":
                keep_nee = ~keep_nee
            ok = ok & keep_nee
        # zero-contribution lanes (specular bsdf f=0, backfacing light,
        # zero-radiance sample) need no occlusion query: drop them from the
        # shadow wavefront — they land in all-dead blocks at floor cost.
        # The reference reaches the same effect through its shadow != 0
        # test before the shadow trace (shade.cl NoShadow path).
        need_sh = ok & (contrib.max(axis=-1) > 0.0)
        rays_traced = rays_traced + need_sh.sum()  # shadow rays
        if fuse:
            # defer: the occlusion query joins the NEXT extension dispatch
            pend = (sray_o, ls.dir, ls.dist,
                    jnp.where(need_sh[:, None], contrib, 0.0), need_sh)
        else:
            u_sh = (r_l[:, 0] * 16777216.0).astype(jnp.uint32)
            occluded = shadow_trace(scene, sray_o, ls.dir, ls.dist, need_sh,
                                    u_sh, has_alpha, presorted=sorted_mode)
            acc = acc + jnp.where((need_sh & ~occluded)[:, None],
                                  contrib, 0.0)

        # ---- next bounce (NextBounce: BSDF sample, RR, flags)
        r_b = rand_fn(depth, DG_BSDF)
        bs = sample_bsdf(p, -ray_d, ns, r_b, feats)
        # alpha pass-through: direction and throughput unchanged, treated as
        # a specular event for MIS
        wi = jnp.where(passthru[:, None], ray_d, bs.wi)
        weight = jnp.where(passthru[:, None], 1.0, bs.weight)
        prev_pdf = jnp.where(passthru, 0.0, bs.pdf)
        prev_spec = jnp.where(passthru, True, bs.is_specular)
        if has_back:  # RAY_EVENT_T-only paths stay camera-visible
            pure_t = pure_t & (passthru | bs.is_transmission) & ~scat

        # ---- fog state machine: transmission INTO a Beer glass arms the
        # fog; transmission OUT (hit on the far side) clears it; internal
        # reflection keeps it armed. (Deviation from attenuationStep's
        # arm-on-any-hit: the reference also arms on front-face REFLECTIONS,
        # wrongly fogging the next outside segment — we arm on entry only.)
        if has_fog:
            beer = alive & (p.fog_mult > 0.0) & ~passthru
            enter = beer & bs.is_transmission & front
            leave = beer & bs.is_transmission & ~front
            armed = jnp.concatenate([p.fog_color, p.fog_mult[:, None]], 1)
            fog_state = jnp.where(enter[:, None], armed,
                                  jnp.where(leave[:, None], 0.0, fog_state))

        # ---- SSS boundary event (ref sampleAndEvalBxDF SSS branch,
        # CPUExp_IntegratorSSS.cpp:36): the direction/weight/pdf come from
        # the REGULAR lobe mixture above — fetch_material folded the
        # reference's branch probabilities (transmit w.p. T with color 1-kd,
        # else diffuse-reflect with color kd) into effective diffuse kd(1-T)
        # + translucency (1-kd)T lobes (bsdf/core.py:164-176), which
        # sample_bsdf/eval_bsdf draw with pdfs consistent with NEE and the
        # env MIS. (A custom T-branch sampler here reported prev_pdf without
        # its branch probability, so the implicit-hit and NEE MIS weights
        # summed >1 at every boundary crossing — a few % surplus per event
        # that compounded over multi-crossing paths; caught by the SSS
        # oracle cross-check, tests/test_sss_blend.py.) Only the medium
        # STATE is SSS-specific: picking the translucency lobe crosses the
        # boundary — entering on front hits, exiting on back hits.
        if has_sss:
            is_sss = alive & ~scat & ~passthru & (p.sss_transmission > 0.0)
            cross = is_sss & bs.is_diff_trans
            enter = cross & front
            exit_ = cross & ~front
            in_med = jnp.where(enter, True, jnp.where(exit_, False, in_med))
            med_sig_s = jnp.where(enter, p.sss_density * p.sss_scattering,
                                  jnp.where(exit_, 0.0, med_sig_s))
            med_sig_a = jnp.where(enter[:, None],
                                  p.sss_density[:, None] * p.sss_absorption,
                                  jnp.where(exit_[:, None], 0.0, med_sig_a))
            med_g = jnp.where(enter, p.sss_phase, med_g)
            # scatter lanes: no surface interaction this step
            weight = jnp.where(scat[:, None], 1.0, weight)
        throughput = throughput * weight
        if not pt_caustics:  # count diffuse bounces (unpackBounceNumDiff)
            diff_bounce = diff_bounce + (alive & ~prev_spec
                                         & ~scat).astype(jnp.int32)
        if layer != "color":
            spec_only = spec_only & prev_spec & ~scat
            if layer == "direct" and depth > 0:
                # RAY_WILL_DIE_NEXT_BOUNCE (material.cl:973-980): past the
                # first vertex a non-specular-only path can contribute
                # nothing more to the direct layer — kill it. (At depth 0
                # the ray survives one segment for the implicit hit.)
                alive = alive & spec_only

        # russian roulette on throughput from min_rr_depth
        if depth >= min_rr_depth:
            q = jnp.clip(throughput.max(axis=-1), 0.05, 1.0)
            u_rr = rand_fn(depth, DG_RR)[:, 0]
            kill = u_rr >= q
            throughput = throughput / q[:, None]
            alive = alive & ~kill

        alive = alive & (throughput.max(axis=-1) > 1e-7)
        n_off = jnp.where((bs.is_transmission | passthru)[:, None],
                          -ngs, ngs)
        ray_o = offs_ray_pos(pos, n_off, wi)
        if has_sss:  # scattered lanes continue from inside the medium
            ray_o = jnp.where(scat[:, None], pos_scat, ray_o)
            wi = jnp.where(scat[:, None], hg_dir, wi)
            prev_spec = jnp.where(scat, True, prev_spec)
            prev_pdf = jnp.where(scat, 0.0, prev_pdf)
        ray_d = wi

    if pend is not None:
        # flush the final bounce's deferred NEE: no extension dispatch
        # follows, so resolve occlusion with one dedicated any-hit (same
        # predicate the unfused path uses: hit exists in (eps, 0.995*dist))
        po, pd, pdist, pcontrib, pmask = pend
        ah = any_hit if sorted_mode else any_hit_sorted
        occluded_p = ah(scene, po, pd, pdist * 0.995, active=pmask)
        acc = acc + jnp.where(occluded_p[:, None], 0.0, pcontrib)

    if sorted_mode:  # restore caller ray order (one scatter)
        acc = jnp.zeros((R, 3), jnp.float32).at[orig_pos].set(acc)
    return acc, rays_traced


@partial(jax.jit, static_argnames=("max_depth", "min_rr_depth", "has_alpha"))
def pt_trace(scene, ray_o, ray_d, sample_idx, seed, max_depth: int = 5, min_rr_depth: int = 3,
             has_alpha: bool = False):
    """Hash-RNG path tracer (the default PT entry)."""

    def rand_fn(sidx, depth, group):
        return rng.rand4(sidx, depth, group, seed)

    return pt_trace_impl(scene, ray_o, ray_d, rand_fn, max_depth, min_rr_depth,
                         has_alpha, sample_idx=sample_idx)


# ----------------------------------------------------------------------------
# Full-frame pass driver (BeginTracingPass analogue, unified sampling)
# ----------------------------------------------------------------------------

from functools import lru_cache


@lru_cache(maxsize=8)
def _morton_pixel_order(W: int, H: int):
    """Flat pixel ids in Morton (z-curve) order, static per resolution."""
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs.reshape(-1).astype(np.uint64)
    ys = ys.reshape(-1).astype(np.uint64)
    key = np.zeros(W * H, np.uint64)
    for b in range(16):
        key |= ((xs >> b) & 1) << (2 * b)
        key |= ((ys >> b) & 1) << (2 * b + 1)
    order = np.argsort(key)
    return ((ys[order] * W) + xs[order]).astype(np.uint32)


@lru_cache(maxsize=8)
def _morton_pixel_inverse(W: int, H: int):
    """inv[pixel] = rank of that pixel in Morton order — the STATIC inverse
    permutation, so Morton-ordered band results land in the framebuffer via
    one GATHER instead of a scatter (scatter measured 2.8 ms vs gather
    0.6 ms per 256k rows, tools/exp_stage_floor.py)."""
    order = _morton_pixel_order(W, H)
    inv = np.empty(W * H, np.int32)
    inv[order] = np.arange(W * H, dtype=np.int32)
    return inv


# megablock: max rays per dispatch — decouples image size from compile
# size / device footprint (CalcMegaBlockSize, GPUOCLLayer.cpp:841-876).
# Bigger bands amortize per-op fixed costs (gathers/sorts cost ~ms per OP
# on this TPU) at the price of footprint; HYDRA_MEGABLOCK_LOG2 overrides
# for A/B measurement.
import os as _os

MEGABLOCK = 1 << int(_os.environ.get("HYDRA_MEGABLOCK_LOG2", "18"))


def render_band_impl(scene, pass_idx, seed, max_depth: int = 5,
                     band: tuple[int, int] | None = None):
    """Trace one sample for the Morton-ordered pixel band [start, end);
    returns (colors (B,3), pix ids (B,), ray count)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    R = W * H
    start, end = band if band is not None else (0, R)
    # Morton (z-order) pixel traversal: consecutive 256-ray blocks become
    # 16x16 screen tiles, the coherence the block traversal kernels need
    # (MakeEyeRaysUnifiedSampling consumes a Morton-sorted z-index the same
    # way, screen.cl:280)
    pix = jnp.asarray(_morton_pixel_order(W, H)[start:end])
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    B = end - start

    sample_idx = pix * jnp.uint32(0x9E3779B9) ^ jnp.uint32(pass_idx)
    qmc_idx = jnp.broadcast_to(jnp.uint32(pass_idx), (B,))
    jitter = rng.screen_sample(qmc_idx, pix)
    lens = rng.rand2(sample_idx, 0, DG_LENS, seed)

    ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
    has_alpha = bool(scene.settings.has_alpha) if scene.settings is not None else False
    color, rays = pt_trace(scene, ray_o, ray_d, sample_idx, seed, max_depth=max_depth,
                           has_alpha=has_alpha)
    # clamp fireflies like runKernel_ClampFloat4 (GPUOCLLayerCore.cpp:110);
    # the bound is the statefile <clamping> (HRT_PATH_TRACE_CLAMPING)
    cl = scene.settings.clamp if scene.settings is not None else 1e6
    return jnp.clip(color, 0.0, cl), pix, rays


def render_pass_impl(scene, pass_idx, seed, max_depth: int = 5):
    """One sample for every pixel; returns ((H, W, 3) radiance, ray count).
    Unjitted body — the graft entry point compile-checks this directly."""
    H, W = scene.camera.height, scene.camera.width
    color, pix, rays = render_band_impl(scene, pass_idx, seed, max_depth)
    fb = color[jnp.asarray(_morton_pixel_inverse(W, H))]  # static inverse
    return fb.reshape(H, W, 3), rays


render_pass = jax.jit(render_pass_impl, static_argnames=("max_depth",))


@partial(jax.jit, static_argnames=("n_pass", "max_depth", "band"))
def render_passes_band(scene, pass_base, seed, n_pass: int = 8,
                       max_depth: int = 5, band: tuple[int, int] | None = None):
    """N passes over one megablock band inside ONE dispatch (lax.fori over
    the pass index). Returns (colors sum (B,3), pix (B,), total rays)."""

    def body(i, st):
        acc, rays = st
        c, pix, r = render_band_impl(scene, pass_base + i.astype(jnp.uint32),
                                     seed, max_depth=max_depth, band=band)
        return acc + c, rays + r

    H, W = scene.camera.height, scene.camera.width
    start, end = band if band is not None else (0, H * W)
    acc0 = jnp.zeros((end - start, 3), jnp.float32)
    acc, rays = jax.lax.fori_loop(0, n_pass, body,
                                  (acc0, jnp.zeros((), jnp.float32)))
    pix = jnp.asarray(_morton_pixel_order(W, H)[start:end])
    return acc, pix, rays


def render_passes(scene, pass_base, seed, n_pass: int = 8, max_depth: int = 5):
    """N full-frame passes, megablock-banded when the frame exceeds
    MEGABLOCK rays (CalcMegaBlockSize semantics: dispatch size decoupled
    from resolution). Returns (sum of N pass images (H,W,3), total rays).

    HYDRA_REGEN=1 routes supported scenes through the regenerating
    wavefront (integrators/pt_regen.py): same sample set, ~1.0 lane
    utilization instead of lockstep bounces over dead lanes."""
    if _os.environ.get("HYDRA_REGEN") == "1":
        from hydracore_tpu.integrators.pt_regen import (regen_supported,
                                                        render_passes_regen)

        if regen_supported(scene):
            return render_passes_regen(scene, pass_base, seed, n_pass=n_pass,
                                       max_depth=max_depth)
    H, W = scene.camera.height, scene.camera.width
    R = H * W
    rays = jnp.zeros((), jnp.float32)
    step = min(MEGABLOCK, R)
    bands = []
    for start in range(0, R, step):
        end = min(start + step, R)
        acc, pix, r = render_passes_band(scene, pass_base, seed, n_pass,
                                         max_depth, (start, end))
        bands.append(acc)
        rays = rays + r
    # bands concatenate to the full Morton-ordered frame; land it with the
    # STATIC inverse permutation (gather) instead of per-band scatters
    morton_full = bands[0] if len(bands) == 1 else jnp.concatenate(bands)
    fb = morton_full[jnp.asarray(_morton_pixel_inverse(W, H))]
    return fb.reshape(H, W, 3), rays


@partial(jax.jit, static_argnames=("max_depth", "k_samples"))
def render_tile_production(scene, pix_ids, pass_base, seed, k_samples: int = 64,
                           max_depth: int = 5):
    """Production sampling: K coherent samples per pixel in ONE dispatch,
    reduced to the per-pixel mean in-kernel (ref RunProductionSamplingMode,
    GPUOCLLayerOther.cpp:502 — PMPIX_SAMPLES coherent blocks + reduction).
    pix_ids: (P,) flat pixel ids; returns (P, 3) mean radiance."""
    cam = scene.camera
    W = cam.width
    P = pix_ids.shape[0]
    pix = jnp.repeat(pix_ids, k_samples)
    samp = jnp.tile(jnp.arange(k_samples, dtype=jnp.uint32), (P,)) + pass_base
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    sample_idx = pix * jnp.uint32(0x9E3779B9) ^ samp
    jitter = rng.screen_sample(samp, pix)
    lens = rng.rand2(sample_idx, 0, DG_LENS, seed)
    ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
    has_alpha = bool(scene.settings.has_alpha) if scene.settings is not None else False
    color, _ = pt_trace(scene, ray_o, ray_d, sample_idx, seed, max_depth=max_depth,
                        has_alpha=has_alpha)
    cl = scene.settings.clamp if scene.settings is not None else 1e6
    color = jnp.clip(color, 0.0, cl)
    return color.reshape(P, k_samples, 3).mean(axis=1)


def render_production(scene, spp: int, seed: int = 777, max_depth: int | None = None,
                      tile_pixels: int = 16384):
    """Offline 'production' render: pixel tiles x coherent sample blocks.
    Fewer, larger dispatches — also friendlier to runtimes that penalize
    many small dispatches."""
    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    scene = jax.device_put(scene)
    k = min(max(spp, 1), 64)
    n_rounds = -(-spp // k)  # ceil: never silently under-sample
    out = jnp.zeros((H * W, 3), jnp.float32)
    for start in range(0, H * W, tile_pixels):
        ids = jnp.arange(start, min(start + tile_pixels, H * W), dtype=jnp.uint32)
        acc = jnp.zeros((ids.shape[0], 3), jnp.float32)
        for r in range(n_rounds):
            acc = acc + render_tile_production(scene, ids, jnp.uint32(r * k),
                                               jnp.uint32(seed), k, md)
        out = out.at[start : start + ids.shape[0]].set(acc / n_rounds)
    return out.reshape(H, W, 3)


def render(scene, spp: int, seed: int = 777, max_depth: int | None = None, progress=None):
    """Accumulate `spp` passes; returns (H, W, 3) float32 mean radiance.

    Host pass loop mirroring console Draw/hrDrawPassOnly
    (main_app_console.cpp:216): accumulate raw, normalize at read
    (SURVEY.md §8.6 contract)."""
    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    scene = jax.device_put(scene)  # keep the scene heap device-resident
    fb = jnp.zeros((H, W, 3), jnp.float32)
    chunk = min(8, spp)
    i = 0
    while i < spp:
        k = min(chunk, spp - i)
        color, _ = render_passes(scene, jnp.uint32(i), jnp.uint32(seed),
                                 n_pass=k, max_depth=md)
        fb = fb + color
        i += k
        if progress is not None:
            progress(i - 1)
    return fb / spp
