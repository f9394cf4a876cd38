"""SBDPT — bidirectional path tracing with s-t connections and full MIS.

TPU rebuild of the reference's bidirectional stack
(hydra_drv/GPUOCLLayerAdvanced.cpp:599 SBDPT_Pass / :949 EvalSBDPT,
hydra_drv/shaders/mlt.cl:723 MMLTCameraPathBounce / :1135
MMLTLightPathBounce / :1472 MMLTConnect, hydra_drv/cbidir.h PathVertex /
PdfVertex machinery). The design is TPU-first: whole wavefronts of camera
and light subpaths are generated in lockstep with every vertex recorded as
stacked arrays, then every (s, t) strategy is evaluated batched — no
per-thread recursion, no divergence.

MIS uses the explicit-product form of the power heuristic: for an
assembled path x_0..x_{k-1} (x_0 = camera pinhole, x_{k-1} = the light
sample y_0) the per-vertex area pdfs from the camera side (pf) and the
light side (pl) give each strategy t' (number of camera vertices) the
density
    p(t') = prod_{0<i<t'} pf[i] * prod_{t'<=i<k} pl[i]
and w = D(t)^2 / sum_t' D(t')^2, with D(1) scaled by the light-subpath
count (t'=1 splats draw from every light path in the wavefront — Veach's
n_i p_i weighting). Delta (specular) scatter pdfs are remapped to 1 with
the adjacent connection strategies zeroed — the bookkeeping cbidir.h's
PdfVertex encodes per vertex.

Camera measure is per-pixel (image plane at d_img = H/(2 tan(fov/2)) in
pixel units), identical to integrators/lt.py's CameraImageToSurfaceFactor
analogue, so PT / LT / SBDPT estimate the same per-pixel integral.

Scope: area-class lights (rect/disk/sphere/cylinder/mesh) participate in
every strategy; the sky/environment participates in every strategy too —
s'=0 escapes (the env s'=0 block below, ref cbidir.h:619-625 /
mlt.cl:723), directional s'=1 NEE, and env-started light subpaths — using
the infinite-light convention (env endpoint in solid-angle measure, first
surface vertex from the env at planar bounding-disk density). Delta
lights (point/spot/direct) participate via NEE and light-subpath
strategies but have no s'=0 implicit hits (nothing to hit).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.bsdf.core import (apply_bump, fetch_material, scene_feats)
from hydracore_tpu.bsdf.core import eval_bsdf as _eval_bsdf_raw
from hydracore_tpu.bsdf.core import sample_bsdf as _sample_bsdf_raw

def eval_bsdf(p, wo, wi, n, feats=None):
    """feats is threaded explicitly from _bdpt_core (no module state)."""
    return _eval_bsdf_raw(p, wo, wi, n) if feats is None else \
        _eval_bsdf_raw(p, wo, wi, n, feats)


def sample_bsdf(p, wo, n, rands, feats=None):
    return _sample_bsdf_raw(p, wo, n, rands) if feats is None else \
        _sample_bsdf_raw(p, wo, n, rands, feats)
from hydracore_tpu.integrators.pt import compute_hit, make_eye_rays
from hydracore_tpu.lights.sampling import (FAR_DIST, _light_types,
                                           env_radiance, sample_light_fwd,
                                           scene_bounding_sphere,
                                           select_light)
from hydracore_tpu.scene.lights import (LIGHT_AREA_DISK, LIGHT_AREA_RECT,
                                        LIGHT_CYLINDER, LIGHT_MESH,
                                        LIGHT_SKY, LIGHT_SPHERE)

# light types a camera ray can land on (s'=0 strategies exist)
HITTABLE_TYPES = (LIGHT_AREA_RECT, LIGHT_AREA_DISK, LIGHT_SPHERE,
                  LIGHT_CYLINDER, LIGHT_MESH)
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import (any_hit_sorted, closest_hit,
                                         closest_hit_sorted)
from hydracore_tpu.utils.math3d import dot3, normalize3, offs_ray_pos

INV_PI = 1.0 / np.pi

# rng dimension groups (distinct from PT's 0..4 and LT's 5..6)
DG_BD_LENS = 7
DG_BD_CAM_BSDF = 8
DG_BD_LGT_EMIT = 9
DG_BD_LGT_BSDF = 10
DG_BD_BLEND = 11  # blend-tree walk uniforms (col 0)


def _remap1(x):
    """remap0 of the reference/PBRT MIS walk: delta pdfs count as 1."""
    return jnp.where(x > 0.0, x, 1.0)


def _to_area(pdf_w, from_pos, to_pos, to_ng):
    """Solid-angle pdf at `from` -> area pdf at `to` (cbidir.h PdfWtoA)."""
    d = to_pos - from_pos
    d2 = jnp.maximum(dot3(d, d), 1e-12)
    w = d * jax.lax.rsqrt(d2)[:, None]
    return pdf_w * jnp.abs(dot3(w, to_ng)) / d2


class _V:
    """One recorded subpath vertex: attribute bag of (R,...) arrays."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _camera_data(cam):
    tan_half = cam.mProjInv[1, 1]
    d_img = cam.height / (2.0 * tan_half)
    return tan_half, d_img


def cam_pdf_w(cam, w_world):
    """Per-pixel-measure solid-angle pdf of the camera emitting direction
    w_world: d_img^2 / cos^3 (the CameraImageToSurfaceFactor core)."""
    view = jnp.linalg.inv(cam.mWorldViewInv)[:3, :3]
    wv = w_world @ view.T
    cos_c = jnp.maximum(-wv[:, 2], 1e-6)
    _, d_img = _camera_data(cam)
    return d_img * d_img / (cos_c ** 3)


def project_to_screen(cam, pos):
    """World pos -> (pix_flat, on_screen, w_to_cam, dist, cos_cam)."""
    W, H = cam.width, cam.height
    tan_half, _ = _camera_data(cam)
    view = jnp.linalg.inv(cam.mWorldViewInv)
    pv = pos @ view[:3, :3].T + view[:3, 3]
    z = -pv[:, 2]
    in_front = z > 1e-4
    sx = pv[:, 0] / jnp.maximum(z, 1e-6) / (tan_half * W / H)
    sy = pv[:, 1] / jnp.maximum(z, 1e-6) / tan_half
    px = jnp.floor((sx + 1.0) * 0.5 * W).astype(jnp.int32)
    py = jnp.floor((1.0 - sy) * 0.5 * H).astype(jnp.int32)
    on = in_front & (px >= 0) & (px < W) & (py >= 0) & (py < H)
    to_cam = cam.pos - pos
    dist2 = jnp.maximum(dot3(to_cam, to_cam), 1e-12)
    dist = jnp.sqrt(dist2)
    w_cam = to_cam / dist[:, None]
    cos_cam = jnp.maximum(z / dist, 1e-6)
    flat = jnp.clip(py, 0, H - 1) * W + jnp.clip(px, 0, W - 1)
    return flat, on, w_cam, dist, cos_cam


def light_emit_pdf_w(cos_at_light):
    """Solid-angle pdf of the cosine-weighted emission the forward sampler
    uses for hittable (area-class) lights (clight.h LightSampleForward)."""
    return jnp.maximum(cos_at_light, 0.0) * INV_PI


# ----------------------------------------------------------------------------
# Subpath generation
# ----------------------------------------------------------------------------

def trace_camera_subpath(scene, ray_o, ray_d, rand_fn, n_surf: int,
                         feats=None, n_lane=None):
    """Trace z_1..z_{n_surf} (z_0 = camera pinhole, implicit).

    Vertex fields: pos, ns, ng, wo (unit, toward previous vertex), beta
    (throughput up to and including arrival), pf (area pdf of this vertex
    from the camera side), pr (area pdf of this vertex from one step
    deeper — valid for i < last-1), valid, spec (scatter AT this vertex
    was delta), mat, em_color, light_row.

    n_lane (R,) int32 optionally caps each LANE's surface-vertex count —
    deeper steps go inactive for that lane (the merged per-depth MMLT
    dispatch uses this so a k=3 chain doesn't pay k_max traversals; the
    reference's per-depth thread split, GPUOCLLayerAdvanced.cpp:518)."""
    R = ray_o.shape[0]
    cam = scene.camera
    verts = []
    beta = jnp.ones((R, 3), jnp.float32)
    alive = jnp.ones((R,), bool)
    prev_pos = jnp.broadcast_to(cam.pos, (R, 3))
    pdf_w_prev = cam_pdf_w(cam, ray_d)

    for i in range(n_surf):
        if n_lane is not None:
            alive = alive & (jnp.int32(i) < n_lane)
        trace = closest_hit if i == 0 else closest_hit_sorted
        t, tri, u, v = trace(scene, ray_o, ray_d, active=alive)
        hit = alive & (tri >= 0)
        pos, n, ng, uv, mat_id, tri_light, tang = compute_hit(
            scene, tri, u, v, ray_o, ray_d, t)
        p = fetch_material(scene, mat_id, uv, pos, n, wo=-ray_d,
                           u_blend=rand_fn(i, DG_BD_BLEND)[:, 0])
        n = apply_bump(scene, p, n, tang, uv)
        n = jnp.where(dot3(n, -ray_d)[:, None] >= 0.0, n, -n)
        ng_o = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)

        pf = _to_area(pdf_w_prev, prev_pos, pos, ng_o)
        # env escape bookkeeping (the "sky strategy": cbidir.h:619-625
        # environmentColorExtended in the bidir path): a live ray that
        # missed ends the path at the environment — record the direction
        # and the RAW solid-angle arrival pdf (the env endpoint lives in
        # directional measure; see the env s'=0 block in _bdpt_core).
        v_rec = _V(pos=pos, ns=n, ng=ng_o, wo=-ray_d, beta=beta, pf=pf,
                   pr=jnp.zeros((R,), jnp.float32), valid=hit,
                   spec=jnp.zeros((R,), bool),
                   is_env=alive & (tri < 0), env_dir=ray_d,
                   pf_w_arr=pdf_w_prev,
                   mat=p, em_color=p.em_color, light_row=tri_light)
        verts.append(v_rec)

        if i == n_surf - 1:
            break

        r_b = rand_fn(i, DG_BD_CAM_BSDF)
        bs = sample_bsdf(p, -ray_d, n, r_b, feats)
        v_rec.spec = bs.is_specular
        beta = beta * bs.weight
        alive = hit & (beta.max(axis=-1) > 1e-7)

        # pr of the PREVIOUS vertex: this vertex scattering back to it
        _, pdf_back = eval_bsdf(p, bs.wi, -ray_d, n, feats)
        pdf_back = jnp.where(bs.is_specular, 0.0, pdf_back)
        if i >= 1:
            verts[i - 1].pr = _to_area(pdf_back, pos, verts[i - 1].pos,
                                       verts[i - 1].ng)

        pdf_w_prev = jnp.where(bs.is_specular, 0.0, bs.pdf)
        prev_pos = pos
        n_off = jnp.where(bs.is_transmission[:, None], -ng_o, ng_o)
        ray_o = offs_ray_pos(pos, n_off, bs.wi)
        ray_d = bs.wi

    return verts


def trace_light_subpath(scene, rand_fn, n_surf: int, feats=None,
                        n_lane=None):
    """Sample y_0 on a light, trace y_1..y_{n_surf}.

    y0 fields: pos, ns, ng, beta (= Le/(pick*pdfA)), pf (= pick*pdfA),
    pr (camera-side area pdf once y_1's continuation is known), hittable
    (area-class light — s'=0 strategies exist), valid."""
    r_e = rand_fn(0, DG_BD_LGT_EMIT)
    l_idx, pick_prob = select_light(scene.lights, r_e[:, 3])
    ls = sample_light_fwd(scene, l_idx, r_e)
    R = ls.pos.shape[0]
    ltype = scene.lights.ltype[l_idx]
    hittable = jnp.zeros((R,), bool)
    for ht in HITTABLE_TYPES:
        hittable = hittable | (ltype == ht)

    # sky lanes: the env endpoint lives in DIRECTIONAL measure (PBRT-style
    # infinite-light convention; ref cbidir env handling mlt.cl:723):
    #   pl[k-1] (endpoint density)  = pick * env_pdf_w(emit dir)
    #   pl[k-2] (first surface hit) = planar disk density * |cos|
    # and the env is always "hittable" (a camera ray can escape to it).
    is_env0 = (ltype == LIGHT_SKY) if LIGHT_SKY in _light_types(scene) \
        else jnp.zeros((R,), bool)
    env_dir0 = -ls.dir  # direction TOWARD the sky
    y0 = _V(pos=ls.pos, ns=ls.norm, ng=ls.norm,
            beta=ls.radiance / jnp.maximum(ls.pdf_a * pick_prob, 1e-12)[:, None],
            pf=jnp.where(is_env0, ls.pdf_w * pick_prob,
                         ls.pdf_a * pick_prob),
            pr=jnp.zeros((R,), jnp.float32),
            spec=jnp.zeros((R,), bool),
            is_env=is_env0, env_dir=env_dir0,
            # directional beta for the s'=1 env connect (radiance over the
            # DIRECTION density; garbage on non-sky lanes, always masked)
            beta_dir=ls.radiance / jnp.maximum(
                ls.pdf_w * pick_prob, 1e-12)[:, None],
            pdf_a_far=ls.pdf_a,
            hittable=hittable | is_env0, valid=jnp.ones((R,), bool),
            light_row=l_idx)

    verts = []
    beta = y0.beta * (ls.cos_at_light / jnp.maximum(ls.pdf_w, 1e-12))[:, None]
    alive = jnp.ones((R,), bool)
    ray_o = offs_ray_pos(ls.pos, ls.norm, ls.dir)
    ray_d = ls.dir
    prev_pos = ls.pos
    pdf_w_prev = ls.pdf_w

    for j in range(n_surf):
        if n_lane is not None:  # per-lane depth cap (merged MMLT groups)
            alive = alive & (jnp.int32(j) < n_lane)
        t, tri, u, v = closest_hit_sorted(scene, ray_o, ray_d, active=alive)
        hit = alive & (tri >= 0)
        pos, n, ng, uv, mat_id, _, tang = compute_hit(
            scene, tri, u, v, ray_o, ray_d, t)
        p = fetch_material(scene, mat_id, uv, pos, n, wo=-ray_d,
                           u_blend=rand_fn(j + 1, DG_BD_BLEND)[:, 0])
        n = apply_bump(scene, p, n, tang, uv)
        n = jnp.where(dot3(n, -ray_d)[:, None] >= 0.0, n, -n)
        ng_o = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)

        pf = _to_area(pdf_w_prev, prev_pos, pos, ng_o)
        if j == 0:
            # env light paths: the first surface vertex's light-side
            # density is the PLANAR disk density, not pdf_w-to-area
            pf = jnp.where(is_env0,
                           y0.pdf_a_far * jnp.abs(dot3(ng_o, ray_d)), pf)
        v_rec = _V(pos=pos, ns=n, ng=ng_o, wo=-ray_d, beta=beta, pf=pf,
                   pr=jnp.zeros((R,), jnp.float32), valid=hit,
                   spec=jnp.zeros((R,), bool), mat=p)
        verts.append(v_rec)

        if j == n_surf - 1:
            break

        r_b = rand_fn(j + 1, DG_BD_LGT_BSDF)
        bs = sample_bsdf(p, -ray_d, n, r_b, feats)
        v_rec.spec = bs.is_specular
        beta = beta * bs.weight
        alive = hit & (beta.max(axis=-1) > 1e-7)

        _, pdf_back = eval_bsdf(p, bs.wi, -ray_d, n, feats)
        pdf_back = jnp.where(bs.is_specular, 0.0, pdf_back)
        if j >= 1:
            verts[j - 1].pr = _to_area(pdf_back, pos, verts[j - 1].pos,
                                       verts[j - 1].ng)
        else:
            # env y0 lives in directional measure: the camera-side density
            # of scattering back toward the sky is the RAW solid-angle pdf
            y0.pr = jnp.where(is_env0, pdf_back,
                              _to_area(pdf_back, pos, y0.pos, y0.ng))

        pdf_w_prev = jnp.where(bs.is_specular, 0.0, bs.pdf)
        prev_pos = pos
        n_off = jnp.where(bs.is_transmission[:, None], -ng_o, ng_o)
        ray_o = offs_ray_pos(pos, n_off, bs.wi)
        ray_d = bs.wi

    return y0, verts


# ----------------------------------------------------------------------------
# Assembled-path pdf lists + MIS
# ----------------------------------------------------------------------------

def _assemble(R, zs, ys, y0, t: int, s: int, junc):
    """pf/pl/spec lists for the assembled path x_0..x_{k-1}, k = s + t.

    x_0 = pinhole, x_i = z_i (= zs[i-1]) for 1<=i<=t-1,
    x_{t-1+m} = y_{s-m} for 1<=m<=s (y_j = ys[j-1] for j>=1, y_0 = y0).

    junc: dict with the connection-dependent pdfs (already area-measure):
      pf_junc   — pdfA(x_t <- x_{t-1})        [absent when s == 0]
      pf_junc2  — pdfA(x_{t+1} <- x_t)        [when s >= 2]
      pl_junc   — pdfA(x_{t-1} <- x_t)        [absent when s+t trivial]
      pl_junc2  — pdfA(x_{t-2} <- x_{t-1})    [when t >= 3]
    """
    one = jnp.ones((R,), jnp.float32)
    k = s + t
    xs = [None]  # x_0 camera
    xs += [zs[i - 1] for i in range(1, t)]
    xs += [(ys[s - m - 1] if s - m >= 1 else y0) for m in range(1, s + 1)]

    pf = [one] * k
    for i in range(1, t):
        pf[i] = zs[i - 1].pf
    if s >= 1:
        pf[t] = junc["pf_junc"]
    if s >= 2:
        pf[t + 1] = junc["pf_junc2"]
    for i in range(t + 2, k):
        pf[i] = xs[i].pr  # stored camera-side scatter-back pdfs

    pl = [one] * k
    if s >= 1:
        pl[k - 1] = y0.pf
        for m in range(1, s):  # x_{t-1+m} = y_{s-m}, generated from y_{s-m-1}
            pl[t - 1 + m] = xs[t - 1 + m].pf
    if "pl_junc" in junc:
        pl[t - 1] = junc["pl_junc"]
    if t >= 3 and "pl_junc2" in junc:
        pl[t - 2] = junc["pl_junc2"]
    for i in range(1, t - 2):
        pl[i] = zs[i - 1].pr

    spec = [jnp.zeros((R,), bool)] * k
    for i in range(1, k):
        spec[i] = xs[i].spec
    return pf, pl, spec


def _mis_weight(pf, pl, spec, can, t_strat: int, n_splat, y0_hittable,
                three_way: bool):
    """Power-heuristic weight for the strategy with t_strat camera vertices
    (t_strat == k means s'=0: the camera path hits the light)."""
    k = len(pf)
    if three_way:
        allowed = {1, k - 1, k}
    else:
        allowed = set(range(1, k + 1))
    if k == 2:
        # the (s'=1, t'=1) directly-visible-light splat is not sampled;
        # keeping it in the denominator would leak energy on k=2 paths
        allowed.discard(1)

    # Incremental pdf-RATIO walk relative to the sampled strategy (the
    # PBRT MISWeight `ri` recursion): r(tp) = p_tp / p_{t_strat}, built as
    # a product of per-vertex pf/pl ratios. Absolute per-strategy products
    # of area pdfs overflow float32 on deep paths (7 vertices at ~1e4-1e5
    # each reach 1e20; squaring hits inf and inf/inf => NaN pixels); the
    # ratio form stays O(1) near the sampled strategy and degrades to
    # w -> 0 (not NaN) when an alternative dominates.
    def ok_for(tp):
        if tp == k:  # implicit hit: light must be geometrically hittable
            return y0_hittable & ~spec[k - 1]
        return (~spec[tp - 1] & ~spec[tp]) if tp >= 2 else ~spec[tp]

    def term(tp, r):
        d = jnp.where(ok_for(tp) & can, r, 0.0)
        if tp == 1:
            d = d * n_splat
        return d * d

    num_f = n_splat if t_strat == 1 else 1.0
    total = term(t_strat, jnp.ones_like(pf[0])) if t_strat in allowed \
        else jnp.zeros_like(pf[0])
    # walk down: p_{tp-1} = p_tp * pl[tp-1] / pf[tp-1]
    r = jnp.ones_like(pf[0])
    for tp in range(t_strat - 1, 0, -1):
        r = r * _remap1(pl[tp]) / _remap1(pf[tp])
        if tp in allowed:
            total = total + term(tp, r)
    # walk up: p_{tp+1} = p_tp * pf[tp] / pl[tp]
    r = jnp.ones_like(pf[0])
    for tp in range(t_strat + 1, k + 1):
        r = r * _remap1(pf[tp - 1]) / _remap1(pl[tp - 1])
        if tp in allowed:
            total = total + term(tp, r)
    num = jnp.where(ok_for(t_strat) & can, jnp.float32(num_f) ** 2, 0.0)
    return jnp.where(total > 0, num / jnp.maximum(total, 1e-30), 0.0)


# ----------------------------------------------------------------------------
# The pass
# ----------------------------------------------------------------------------

def _bdpt_core(scene, ray_o, ray_d, rand_fn, own_pix, n_splat,
               max_depth: int, strategies: str = "full",
               k_only: int | None = None, with_labels: bool = False,
               lane_k=None):
    """Evaluate SBDPT strategies for a wavefront of camera+light
    subpaths. Returns a list of (flat_pix (R,), color (R,3)) contributions
    — one entry per (s, t) strategy evaluated. k_only restricts to paths
    with exactly k vertices (MMLT's per-depth chains). with_labels=True
    returns ((s, t), flat, color) triples instead (the per-strategy oracle
    cross-check consumes these, tests/test_oracle_bdpt.py).

    lane_k (R,) int32: per-LANE path-vertex count — every lane evaluates
    only its own depth's strategies, and subpath tracing goes inactive
    past each lane's depth. This is the merged per-depth MMLT dispatch
    (all chain groups in one wavefront; the reference packs per-depth
    thread ranges into one megablock, GPUOCLLayerAdvanced.cpp:518-595)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    R = ray_o.shape[0]
    three_way = strategies == "3way"

    feats = scene_feats(scene)
    if k_only is None:
        NC = max_depth        # camera surface vertices z_1..z_NC
        NL = max_depth - 1    # light surface vertices y_1..y_NL
    else:
        NC = k_only - 1
        NL = max(k_only - 2, 1)
    nl_c = nl_l = None
    if lane_k is not None:
        nl_c = lane_k - 1             # camera surface vertices this lane
        nl_l = jnp.maximum(lane_k - 2, 0)  # light surface vertices
    zs = trace_camera_subpath(scene, ray_o, ray_d, rand_fn, NC, feats,
                              n_lane=nl_c)
    y0, ys = trace_light_subpath(scene, rand_fn, NL, feats, n_lane=nl_l)

    out = []

    def keep(t, s):
        return k_only is None or (s + t) == k_only

    # ---- s = 0: camera path hits an emitter (PT implicit)
    for t in range(2, NC + 2):
        if not keep(t, 0):
            continue
        z = zs[t - 2]
        on_light = z.valid & (z.em_color.max(axis=-1) > 1e-6) & (z.light_row >= 0)
        front = dot3(z.ns, z.wo) > 0.0
        lrow = jnp.clip(z.light_row, 0, scene.lights.ltype.shape[0] - 1)
        pick = scene.lights.pick_cdf[lrow + 1] - scene.lights.pick_cdf[lrow]
        area = jnp.maximum(scene.lights.area[lrow], 1e-12)

        # treat z_{t-1} as the light vertex y_0 of the assembled path
        y0_here = _V(pos=z.pos, ns=z.ns, ng=z.ng,
                     pf=pick / area, pr=z.pr,
                     spec=jnp.zeros((R,), bool),
                     hittable=on_light, valid=on_light)
        junc = {}
        if t >= 3:
            zp = zs[t - 3]
            dv = zp.pos - z.pos
            dist = jnp.sqrt(jnp.maximum(dot3(dv, dv), 1e-12))
            wl = dv / dist[:, None]
            junc["pl_junc"] = _to_area(light_emit_pdf_w(dot3(z.ns, wl)),
                                       z.pos, zp.pos, zp.ng)
            # note: for s=0 the "pl_junc" slot is x_{t'-?}: with s=0 the
            # light IS x_{k-1}=z_{t-1}; emission toward z_{t-2} fills
            # pl[k-2]:
        pf, pl, spec = _assemble(R, zs, [], y0_here, t, 0, {})
        # s=0 specifics: pl[k-1] = light pos pdf; pl[k-2] = emission pdf
        pl[t - 1] = y0_here.pf
        if t >= 3:
            pl[t - 2] = junc["pl_junc"]
        for i in range(1, t - 2):
            pl[i] = zs[i - 1].pr
        # emissive terminal vertex is never a 'scatter' vertex
        spec[t - 1] = jnp.zeros((R,), bool)
        w = _mis_weight(pf, pl, spec, on_light, t, n_splat,
                        y0_here.hittable, three_way)
        contrib = z.beta * z.em_color * w[:, None]
        out.append(((0, t), own_pix, jnp.where((on_light & front)[:, None],
                                               contrib, 0.0)))

    # ---- s = 0 env: camera path escapes to the sky (the "sky strategy";
    # ref cbidir.h:619-625 environmentColorExtended in the bidir path,
    # mlt.cl:723 MMLTCameraPathBounce env handling). The env endpoint uses
    # DIRECTIONAL measure: pf[k-1] is the raw solid-angle arrival pdf,
    # pl[k-1] the sky sampler's pick * env_pdf_w, pl[k-2] the planar
    # bounding-disk density x |cos| (infinite-light convention).
    if LIGHT_SKY in _light_types(scene):
        from hydracore_tpu.lights.envmap import env_pdf_for_dir

        cdf_l = scene.lights.pick_cdf
        pick_sky = jnp.sum(jnp.where(scene.lights.ltype == LIGHT_SKY,
                                     cdf_l[1:] - cdf_l[:-1], 0.0))
        _, rad_s = scene_bounding_sphere(scene)
        pdf_a_far = 1.0 / jnp.maximum(np.pi * rad_s * rad_s, 1e-12)
        one = jnp.ones((R,), jnp.float32)
        fzero = jnp.zeros((R,), bool)
        for t in range(2, NC + 2):
            if not keep(t, 0):
                continue
            z = zs[t - 2]
            w_dir = z.env_dir
            env_c = env_radiance(scene, w_dir)
            env_pdf = env_pdf_for_dir(scene.env_rows_cdf,
                                      scene.env_cols_cdf,
                                      scene.env_pdf_uv, w_dir)
            pf = [one] * t
            pl = [one] * t
            spec = [fzero] * t
            for i in range(1, t - 1):
                pf[i] = zs[i - 1].pf
                spec[i] = zs[i - 1].spec
            pf[t - 1] = z.pf_w_arr
            pl[t - 1] = pick_sky * env_pdf
            if t >= 3:
                pl[t - 2] = pdf_a_far * jnp.abs(dot3(zs[t - 3].ng, w_dir))
            for i in range(1, t - 2):
                pl[i] = zs[i - 1].pr
            w = _mis_weight(pf, pl, spec, z.is_env, t, n_splat,
                            jnp.ones((R,), bool), three_way)
            out.append(((0, t), own_pix,
                        jnp.where(z.is_env[:, None],
                                  z.beta * env_c * w[:, None], 0.0)))

    # ---- s = 1: NEE from every camera vertex to y0. Sky lanes connect
    # DIRECTIONALLY (toward y0's sampled env direction, shadow ray to
    # infinity, radiance over the direction density) — the env analogue
    # of LightSampleRev's sky branch, kept MIS-consistent with the env
    # s'=0 strategy above.
    env1 = y0.is_env
    for t in range(2, NC + 1):
        if not keep(t, 1):
            continue
        z = zs[t - 2]
        d = y0.pos - z.pos
        d2 = jnp.maximum(dot3(d, d), 1e-12)
        dist = jnp.sqrt(d2)
        wl = d / dist[:, None]
        wl = jnp.where(env1[:, None], y0.env_dir, wl)
        cos_z = dot3(z.ns, wl)
        cos_y = jnp.where(env1, 1.0, dot3(y0.ns, -wl))
        f_z, pdf_z_w = eval_bsdf(z.mat, z.wo, wl, z.ns, feats)
        can = z.valid & ~z.spec & (cos_z > 0) & (cos_y > 1e-6)
        sray_o = offs_ray_pos(z.pos, z.ng, wl)
        occ = any_hit_sorted(scene, sray_o, wl,
                             jnp.where(env1, FAR_DIST, dist * 0.995),
                             active=can)
        G = jnp.abs(cos_z) * jnp.abs(cos_y) / d2
        c_unw = z.beta * f_z * y0.beta * G[:, None]
        c_unw = jnp.where(env1[:, None],
                          z.beta * f_z * y0.beta_dir
                          * jnp.abs(cos_z)[:, None], c_unw)

        junc = {
            "pf_junc": jnp.where(
                env1, pdf_z_w,
                _to_area(pdf_z_w, z.pos, y0.pos, y0.ng)),
            "pl_junc": jnp.where(
                env1, y0.pdf_a_far * jnp.abs(dot3(z.ng, wl)),
                _to_area(light_emit_pdf_w(cos_y), y0.pos, z.pos, z.ng)),
        }
        if t >= 3:
            _, pdf_back = eval_bsdf(z.mat, wl, z.wo, z.ns, feats)
            junc["pl_junc2"] = _to_area(pdf_back, z.pos, zs[t - 3].pos,
                                        zs[t - 3].ng)
        pf, pl, spec = _assemble(R, zs, ys, y0, t, 1, junc)
        w = _mis_weight(pf, pl, spec, can, t, n_splat, y0.hittable,
                        three_way)
        out.append(((1, t), own_pix, jnp.where((can & ~occ)[:, None],
                                               c_unw * w[:, None], 0.0)))

    # ---- t = 1: connect light vertices to the camera (LT splat)
    for s in range(2, NL + 2):
        if not keep(1, s):
            continue
        y = ys[s - 2]
        flat, on, w_cam, dist, cos_cam = project_to_screen(cam, y.pos)
        _, d_img = _camera_data(cam)
        f_y, _ = eval_bsdf(y.mat, y.wo, w_cam, y.ns, feats)
        cos_x = jnp.abs(dot3(w_cam, y.ns))
        img_factor = (d_img / cos_cam) ** 2 / cos_cam
        factor = img_factor * cos_x / jnp.maximum(dist * dist, 1e-12)
        can = y.valid & ~y.spec & on & (cos_x > 0)
        sray_o = offs_ray_pos(y.pos, y.ng, w_cam)
        occ = any_hit_sorted(scene, sray_o, w_cam, dist * 0.995, active=can)
        c_unw = y.beta * f_y * (factor / n_splat)[:, None]

        junc = {
            "pf_junc": _to_area(cam_pdf_w(cam, -w_cam),
                                jnp.broadcast_to(cam.pos, y.pos.shape),
                                y.pos, y.ng),
        }
        _, pdf_down = eval_bsdf(y.mat, w_cam, y.wo, y.ns, feats)
        nxt = ys[s - 3] if s >= 3 else y0
        junc["pf_junc2"] = _to_area(pdf_down, y.pos, nxt.pos, nxt.ng)
        if s == 2:  # env y0: directional measure, raw solid-angle pdf
            junc["pf_junc2"] = jnp.where(env1, pdf_down, junc["pf_junc2"])
        pf, pl, spec = _assemble(R, zs, ys, y0, 1, s, junc)
        w = _mis_weight(pf, pl, spec, can, 1, n_splat, y0.hittable,
                        three_way)
        amt = jnp.where((can & ~occ)[:, None], c_unw * w[:, None], 0.0)
        out.append(((s, 1), flat, amt))

    # ---- s >= 2, t >= 2: inner connections (full SBDPT only)
    if not three_way:
        for t in range(2, NC + 1):
            for s in range(2, NL + 2):
                if (s + t - 1) > max_depth or not keep(t, s):
                    continue
                z = zs[t - 2]
                y = ys[s - 2]
                d = y.pos - z.pos
                d2 = jnp.maximum(dot3(d, d), 1e-12)
                dist = jnp.sqrt(d2)
                wl = d / dist[:, None]
                f_z, pdf_z_w = eval_bsdf(z.mat, z.wo, wl, z.ns, feats)
                f_y, pdf_y_w = eval_bsdf(y.mat, y.wo, -wl, y.ns, feats)
                cos_z = dot3(z.ns, wl)
                cos_y = dot3(y.ns, -wl)
                can = (z.valid & y.valid & ~z.spec & ~y.spec
                       & (cos_z > 0) & (cos_y > 0))
                sray_o = offs_ray_pos(z.pos, z.ng, wl)
                occ = any_hit_sorted(scene, sray_o, wl, dist * 0.995,
                                     active=can)
                G = jnp.abs(cos_z) * jnp.abs(cos_y) / d2
                c_unw = z.beta * f_z * f_y * y.beta * G[:, None]

                junc = {
                    "pf_junc": _to_area(pdf_z_w, z.pos, y.pos, y.ng),
                    "pl_junc": _to_area(pdf_y_w, y.pos, z.pos, z.ng),
                }
                # wo at y is the OUTGOING connection direction -wl (wl
                # points z -> y, i.e. INTO y); passing wl flipped the
                # facing test and zeroed this pdf, mis-weighting every
                # inner connection strategy — caught by the per-(s,t)
                # scalar oracle (tests/test_oracle_bdpt.py)
                _, pdf_y_down = eval_bsdf(y.mat, -wl, y.wo, y.ns, feats)
                nxt = ys[s - 3] if s >= 3 else y0
                junc["pf_junc2"] = _to_area(pdf_y_down, y.pos, nxt.pos,
                                            nxt.ng)
                if s == 2:  # env y0: directional measure
                    junc["pf_junc2"] = jnp.where(env1, pdf_y_down,
                                                 junc["pf_junc2"])
                if t >= 3:
                    _, pdf_z_back = eval_bsdf(z.mat, wl, z.wo, z.ns, feats)
                    junc["pl_junc2"] = _to_area(pdf_z_back, z.pos,
                                                zs[t - 3].pos, zs[t - 3].ng)
                pf, pl, spec = _assemble(R, zs, ys, y0, t, s, junc)
                w = _mis_weight(pf, pl, spec, can, t, n_splat, y0.hittable,
                                False)
                out.append(((s, t), own_pix,
                            jnp.where((can & ~occ)[:, None],
                                      c_unw * w[:, None], 0.0)))

    if lane_k is not None:
        # each lane belongs to one depth group: zero every other depth's
        # strategies (its own subpaths are truncated at lane_k anyway)
        out = [(lbl, flat,
                jnp.where((lane_k == (lbl[0] + lbl[1]))[:, None], amt, 0.0))
               for lbl, flat, amt in out]
    if with_labels:
        return out
    return [(flat, amt) for _lbl, flat, amt in out]


def bdpt_pass_impl(scene, pass_idx, seed, max_depth: int = 5,
                   strategies: str = "full"):
    """One SBDPT sample per pixel -> (H, W, 3) image for this pass.

    strategies: "full" (all s-t connections) or "3way" (the reference's
    IBPT subset: implicit s'=0, NEE s'=1, connect-to-eye t'=1, MIS-combined
    — RenderDriverRTE.cpp:1819-1855 + material.cl:64)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    R = W * H
    from hydracore_tpu.integrators.pt import _morton_pixel_order

    pix = jnp.asarray(_morton_pixel_order(W, H))
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    sample_idx = pix * jnp.uint32(0x9E3779B9) ^ (
        jnp.uint32(pass_idx) * jnp.uint32(0x85EBCA6B))

    def rand_fn(depth, group):
        return rng.rand4(sample_idx, depth, group, seed)

    jitter = rng.screen_sample(jnp.broadcast_to(jnp.uint32(pass_idx), (R,)), pix)
    lens = rng.rand2(sample_idx, 0, DG_BD_LENS, seed)
    ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)

    contribs = _bdpt_core(scene, ray_o, ray_d, rand_fn, pix.astype(jnp.int32),
                          jnp.float32(R), max_depth, strategies)
    img = jnp.zeros((R, 3), jnp.float32)
    for flat, amt in contribs:
        img = img.at[flat].add(amt, mode="drop")
    return jnp.clip(img, 0.0, 1e6).reshape(H, W, 3)


bdpt_pass = jax.jit(bdpt_pass_impl, static_argnames=("max_depth", "strategies"))


def render_bdpt(scene, n_passes: int, seed: int = 777,
                max_depth: int | None = None, strategies: str = "full"):
    """Accumulate SBDPT passes -> (H, W, 3)."""
    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    scene = jax.device_put(scene)
    fb = jnp.zeros((H, W, 3), jnp.float32)
    for i in range(n_passes):
        fb = fb + bdpt_pass(scene, jnp.uint32(i), jnp.uint32(seed),
                            max_depth=md, strategies=strategies)
    return fb / n_passes


def render_ibpt(scene, n_passes: int, seed: int = 777,
                max_depth: int | None = None):
    """IBPT 'instant bidirectional' (reference 3-way MIS): PT + LT with
    accumulated-pdf weights (material.cl:64 UpdateForwardPdfFor3Way,
    cglobals.h:2490 PerRayAcc, RenderDriverRTE.cpp:1819-1855) — here the
    SBDPT machinery restricted to that strategy subset."""
    return render_bdpt(scene, n_passes, seed, max_depth, strategies="3way")
