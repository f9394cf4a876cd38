"""Path-regeneration wavefront PT — full-utilization variant of pt.py.

The pass-loop integrator (pt.render_passes) advances ALL lanes through
max_depth lockstep bounces; lanes whose path terminated early (emitter hit,
env miss, russian roulette) still ride — and pay for — every remaining
stage. The reference keeps a live-thread counter and exits the bounce loop
early only when a whole pass dies (GPUOCLLayerCore.cpp:71-75); true
per-lane compaction is a compile-flag it never shipped
(RAYTR_THREAD_COMPACTION, GPUOCLLayer.cpp:887).

On TPU, dynamic compaction is impossible (static shapes), but its dual is
not: REGENERATION. One persistent R-lane wavefront runs inside a single
`lax.while_loop`; the moment a lane's path dies it splats its radiance and
is refilled with the NEXT (pixel, pass) sample from a global counter. Every
iteration traces and shades R live segments — utilization ~1 by
construction, and the loop runs ~n_pass * avg_path_length iterations
instead of n_pass * max_depth.

Estimator equivalence: the sample SET is identical to pass mode — sample
(pix, pass) uses the same counter-RNG streams (sidx = pix * PHI ^ pass) —
only the schedule differs, so images match pass mode to accumulation-order
rounding (tests/test_regen.py asserts it).

Feature scope: env/sky MIS, emitters, NEE over all light types, alpha
pass-through, blends, RR — everything the bench scenes use. Scenes with
SSS / fog / back-plate / proc-AO state fall back to the pass loop
(pt.render_passes dispatches).
"""
from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.bsdf.core import (apply_bump, eval_bsdf, fetch_material,
                                     sample_bsdf, scene_feats)
from hydracore_tpu.integrators.pt import (DG_ALPHA, DG_BSDF, DG_LENS,
                                          DG_LIGHT, DG_RR, MEGABLOCK,
                                          _morton_pixel_order, compute_hit,
                                          make_eye_rays, mis_weight,
                                          shadow_trace)
from hydracore_tpu.lights.sampling import (env_radiance,
                                           light_eval_pdf_from_hit,
                                           sample_light_rev, select_light)
from hydracore_tpu.ops import rng
from hydracore_tpu.ops.trace_api import (closest_hit, ray_sort_key,
                                         wants_sorted_rays)
from hydracore_tpu.scene.lights import LIGHT_SKY
from hydracore_tpu.utils.math3d import dot3, offs_ray_pos

PHI = 0x9E3779B9


def regen_supported(scene) -> bool:
    """Static feature gate. The regeneration loop now carries every
    per-lane state the pass loop does (fog, SSS medium, back-plate flag,
    AO probes); render-layer separation (direct/indirect) and caustics-off
    live in the pass loop only."""
    st = scene.settings
    return st is None or (getattr(st, "render_layer", "color") == "color"
                          and getattr(st, "pt_caustics", True))


@partial(jax.jit, static_argnames=("n_pass", "max_depth", "min_rr_depth",
                                   "lanes"))
def render_passes_regen(scene, pass_base, seed, n_pass: int = 8,
                        max_depth: int = 5, min_rr_depth: int = 3,
                        lanes: int | None = None):
    """N full-frame passes in ONE dispatch with a regenerating wavefront.
    Returns (fb (H, W, 3) sum of n_pass per-pixel samples, rays traced)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    Npix = W * H
    # lanes may exceed the pixel count: the counter hands each lane a
    # distinct (pixel, pass) sample, so a small frame still fills a full
    # megablock-wide dispatch by running several passes abreast — per-op
    # fixed costs (gathers/sorts are ~per-OP on this TPU) amortize over
    # the whole lane width, which the sequential pass loop cannot do
    R = min(lanes or MEGABLOCK, Npix * n_pass)
    total = jnp.uint32(Npix * n_pass)
    morton = jnp.asarray(_morton_pixel_order(W, H))

    st = scene.settings
    has_alpha = bool(st.has_alpha) if st is not None else False
    has_sky_s = st is None or st.has_sky
    has_back = st is not None and getattr(st, "has_env_back", False)
    has_fog = st is not None and getattr(st, "has_fog", False)
    has_sss = st is not None and getattr(st, "has_sss", False)
    has_proc_ao = st is not None and getattr(st, "has_proc_ao", False)
    feats = scene_feats(scene)
    sorted_mode = wants_sorted_rays(scene)
    # fused-traversal knob (HYDRA_FUSE_TRACE=1, mirrors pt_trace_impl):
    # bounce d's NEE occlusion query rides bounce d+1's extension dispatch
    # as one 2R-wide closest hit. A lane that dies with its NEE still
    # pending delays its death splat (and refill) by one iteration — only
    # RR/throughput kills hit that path, so the utilization cost is small.
    fuse = (not has_alpha) and _os.environ.get("HYDRA_FUSE_TRACE") == "1"
    if has_sky_s:
        has_sky = (scene.lights.ltype == LIGHT_SKY).any()
        sky_row = jnp.argmax(scene.lights.ltype == LIGHT_SKY)
        sky_pick = jnp.where(
            has_sky,
            scene.lights.pick_cdf[sky_row + 1] - scene.lights.pick_cdf[sky_row],
            1.0)

    f32 = jnp.float32

    def rand_fn(sidx, depth, group):
        return rng.rand4(sidx, depth, group, seed)

    def init_state():
        return dict(
            next_ctr=jnp.uint32(0),
            fb=jnp.zeros((Npix, 3), f32),
            rays=jnp.zeros((), f32),
            pix=jnp.zeros((R,), jnp.int32),
            sidx=jnp.zeros((R,), jnp.uint32),
            depth=jnp.zeros((R,), jnp.int32),
            ray_o=jnp.zeros((R, 3), f32),
            ray_d=jnp.ones((R, 3), f32),
            tp=jnp.zeros((R, 3), f32),
            acc=jnp.zeros((R, 3), f32),
            prev_pdf=jnp.zeros((R,), f32),
            prev_spec=jnp.zeros((R,), bool),
            alive=jnp.zeros((R,), bool),
            **({"fog": jnp.zeros((R, 4), f32)} if has_fog else {}),
            **({"pure_t": jnp.zeros((R,), bool)} if has_back else {}),
            **({"med": jnp.zeros((R, 6), f32)} if has_sss else {}),
            # pending NEE: origin(3) dir(3) dist(1) masked-contrib(3) + mask
            **({"pend": jnp.zeros((R, 10), f32),
                "pend_m": jnp.zeros((R,), bool)} if fuse else {}),
        )

    def body(s):
        # ---- 1. regeneration: refill dead lanes with the next samples
        # (a dead lane with an unresolved NEE query keeps its slot — its
        # radiance isn't final until the pending occlusion resolves)
        regen = ~s["alive"]
        if fuse:
            regen = regen & ~s["pend_m"]
        rank = jnp.cumsum(regen.astype(jnp.uint32)) - regen.astype(jnp.uint32)
        new_ctr = s["next_ctr"] + rank
        take = regen & (new_ctr < total)
        pix_n = morton[(new_ctr % jnp.uint32(Npix)).astype(jnp.int32)].astype(jnp.int32)
        pass_n = jnp.asarray(pass_base, jnp.uint32) + new_ctr // jnp.uint32(Npix)
        sidx_n = (pix_n.astype(jnp.uint32) * jnp.uint32(PHI)) ^ pass_n
        jitter = rng.screen_sample(pass_n, pix_n.astype(jnp.uint32))
        lens = rng.rand2(sidx_n, 0, DG_LENS, seed)
        eo, ed = make_eye_rays(cam, pix_n % W, pix_n // W, jitter, lens)

        def sel(new, old):
            m = take
            while m.ndim < new.ndim:
                m = m[..., None]
            return jnp.where(m, new, old)

        pix = sel(pix_n, s["pix"])
        sidx = sel(sidx_n, s["sidx"])
        depth = sel(jnp.zeros((R,), jnp.int32), s["depth"])
        ray_o = sel(eo, s["ray_o"])
        ray_d = sel(ed, s["ray_d"])
        tp = sel(jnp.ones((R, 3), f32), s["tp"])
        acc = sel(jnp.zeros((R, 3), f32), s["acc"])
        prev_pdf = sel(jnp.zeros((R,), f32), s["prev_pdf"])
        prev_spec = sel(jnp.ones((R,), bool), s["prev_spec"])
        if has_fog:
            fog_state = sel(jnp.zeros((R, 4), f32), s["fog"])
        if has_back:
            pure_t = sel(jnp.ones((R,), bool), s["pure_t"])
        if has_sss:
            med = sel(jnp.zeros((R, 6), f32), s["med"])
        if fuse:  # refilled lanes have pend_m False by construction
            pend, pend_m = s["pend"], s["pend_m"]
        alive = s["alive"] | take
        next_ctr = s["next_ctr"] + jnp.minimum(
            regen.sum().astype(jnp.uint32), total - s["next_ctr"])

        # ---- 2. coherence sort (persistent-sorted-wavefront analogue):
        # one u32 sort + one packed permute of the WHOLE lane state
        if sorted_mode:
            key = ray_sort_key(scene, ray_o, ray_d)
            key = jnp.where(alive, key, jnp.uint32(0xFFFFFFFF))
            _, perm = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
            packed = jnp.concatenate([
                ray_o, ray_d, tp, acc,
                prev_pdf[:, None], prev_spec.astype(f32)[:, None],
                alive.astype(f32)[:, None],
                jax.lax.bitcast_convert_type(sidx, f32)[:, None],
                pix.astype(f32)[:, None], depth.astype(f32)[:, None],
            ], axis=1)[perm]
            ray_o, ray_d = packed[:, 0:3], packed[:, 3:6]
            tp, acc = packed[:, 6:9], packed[:, 9:12]
            prev_pdf = packed[:, 12]
            prev_spec = packed[:, 13] > 0.5
            alive = packed[:, 14] > 0.5
            sidx = jax.lax.bitcast_convert_type(packed[:, 15], jnp.uint32)
            pix = packed[:, 16].astype(jnp.int32)
            depth = packed[:, 17].astype(jnp.int32)
            if has_fog:
                fog_state = fog_state[perm]
            if has_back:
                pure_t = pure_t[perm]
            if has_sss:
                med = med[perm]
            if fuse:
                pend = pend[perm]
                pend_m = pend_m[perm]

        # ---- 3. trace + shade one segment (pt_trace_impl bounce body)
        # snapshot entry-liveness IN THE CURRENT LANE ORDER: the death
        # splat below compares against post-shading `alive`, and in sorted
        # mode both must live in post-permute space
        was_alive = alive
        rays = s["rays"] + alive.sum()
        if fuse:
            # one 2R dispatch: [extension rays; last body's shadow rays],
            # then land the resolved NEE — same per-lane accumulation order
            # as the unfused loop (nee_d precedes emit_{d+1})
            t2, tri2, u2, v2 = closest_hit(
                scene,
                jnp.concatenate([ray_o, pend[:, 0:3]]),
                jnp.concatenate([ray_d, pend[:, 3:6]]),
                t_max=jnp.concatenate(
                    [jnp.full((R,), 1e30, f32), pend[:, 6] * 0.995]),
                active=jnp.concatenate([alive, pend_m]))
            t, tri, u, v = t2[:R], tri2[:R], u2[:R], v2[:R]
            unocc = pend_m & (tri2[R:] < 0)
            acc = acc + jnp.where(unocc[:, None], pend[:, 7:10], 0.0)
            pend_entry = pend_m  # every entry query resolves this body
        else:
            t, tri, u, v = closest_hit(scene, ray_o, ray_d, active=alive)
        hit = alive & (tri >= 0)
        miss = alive & ~hit

        # thick-glass Beer fog over the segment just traced (pt.py order)
        if has_fog:
            fog_on = hit & (fog_state[:, 3] > 0.0)
            seg = jnp.where(jnp.isfinite(t), t, 0.0)
            f_att = jnp.exp(-jnp.maximum(1.0 - fog_state[:, 0:3], 0.0)
                            * (fog_state[:, 3] * seg)[:, None])
            tp = jnp.where(fog_on[:, None], tp * f_att, tp)

        # SSS medium walk (CPUExp_IntegratorSSS.cpp:143 / pt.py semantics)
        if has_sss:
            from hydracore_tpu.integrators.pt import DG_SSS, hg_sample
            from hydracore_tpu.utils.math3d import normalize3

            in_med = med[:, 0] > 0.5
            med_sig_s = med[:, 1]
            med_sig_a = med[:, 2:5]
            med_g = med[:, 5]
            r_m = rand_fn(sidx, depth, DG_SSS)
            t_srf = jnp.where(jnp.isfinite(t), t, jnp.float32(3e38))
            d_scat = -jnp.log(jnp.maximum(r_m[:, 0], 1e-12)) \
                / jnp.maximum(med_sig_s, 1e-12)
            scat = alive & in_med & (med_sig_s > 0.0) & (d_scat < t_srf) & hit
            d_abs = jnp.where(scat, d_scat, jnp.minimum(t_srf, 3e38))
            m_att = jnp.exp(-med_sig_a * d_abs[:, None])
            tp = jnp.where((alive & in_med & hit | scat)[:, None],
                           tp * m_att, tp)
            pos_scat = ray_o + d_scat[:, None] * ray_d
            hg_dir = normalize3(hg_sample(ray_d, med_g, r_m[:, 1], r_m[:, 2]))
            alive = alive & ~(in_med & miss)
            miss = miss & ~in_med
        else:
            scat = jnp.zeros((R,), bool)

        if has_sky_s:
            from hydracore_tpu.lights.envmap import env_pdf_for_dir

            env = env_radiance(scene, ray_d)
            env_pdf = env_pdf_for_dir(scene.env_rows_cdf, scene.env_cols_cdf,
                                      scene.env_pdf_uv, ray_d)
            w_env = jnp.where(prev_spec | ~has_sky, 1.0,
                              mis_weight(prev_pdf, env_pdf * sky_pick))
            env_c = env * w_env[:, None]
            if has_back:
                from hydracore_tpu.lights.sampling import env_back_radiance

                env_c = jnp.where(pure_t[:, None],
                                  env_back_radiance(scene, ray_d), env_c)
            acc = acc + jnp.where(miss[:, None], tp * env_c, 0.0)
        alive = alive & hit

        pos, n, ng, uv, mat_id, tri_light, tang = compute_hit(
            scene, tri, u, v, ray_o, ray_d, t)
        r_a = rand_fn(sidx, depth, DG_ALPHA)
        ao_val = None
        if has_proc_ao:
            from hydracore_tpu.integrators.pt import AO_PROBES, DG_AO, ao_probe
            from hydracore_tpu.scene import materials as MC

            from hydracore_tpu.ops.gather import gather_rows

            arow = gather_rows(scene.mat_attr, mat_id)
            ao_t = arow[:, MC.MA_AO_TYPE].astype(jnp.int32)
            rays = rays + (alive & (ao_t > 0)).sum() * AO_PROBES
            ao_val = ao_probe(scene, pos, n, ng, ao_t,
                              arow[:, MC.MA_AO_LENGTH],
                              alive & (ao_t > 0), rand_fn(sidx, depth, DG_AO))
        p = fetch_material(scene, mat_id, uv, pos, n, wo=-ray_d,
                           u_blend=r_a[:, 1], ao=ao_val)
        n = apply_bump(scene, p, n, tang, uv)

        u_a = r_a[:, 0]
        passthru = alive & (p.opacity < 0.999) & (u_a >= p.opacity) & ~scat

        # ---- fused light-row gather (pt.py:523): the implicit-hit MIS eval
        # (hit tri's light id) and the NEE sample (CDF pick) share ONE
        # light_attr gather over 2R concatenated indices. Drawing DG_LIGHT
        # here is value-identical (counter-based RNG). Unlike the pass loop,
        # depth is traced here, so NEE rows are always fetched.
        lrow = jnp.clip(tri_light, 0, scene.lights.ltype.shape[0] - 1)
        r_l = rand_fn(sidx, depth, DG_LIGHT)
        l_idx, _ = select_light(scene.lights, r_l[:, 3])
        rows_hit = rows_nee = None
        if scene.light_attr.shape[0] > 1:
            from hydracore_tpu.ops.gather import gather_rows

            rows2 = gather_rows(scene.light_attr,
                                jnp.concatenate([lrow, l_idx]))
            rows_hit, rows_nee = rows2[:R], rows2[R:]

        em_lum = p.em_color.max(axis=-1)
        is_emitter = alive & (em_lum > 1e-6) & ~passthru & ~scat
        front = dot3(n, -ray_d) > 0.0
        l_pdf_w, l_pick = light_eval_pdf_from_hit(scene, lrow, ray_o, ray_d,
                                                  pos, n, return_pick=True,
                                                  rows=rows_hit)
        w_li = jnp.where(prev_spec | (tri_light < 0), 1.0,
                         mis_weight(prev_pdf, l_pdf_w * l_pick))
        acc = acc + jnp.where((is_emitter & front)[:, None],
                              tp * p.em_color * w_li[:, None], 0.0)
        alive = alive & ~is_emitter

        last = depth >= (max_depth - 1)
        alive = alive & ~last  # the last bounce collects env/emitter only

        ns = jnp.where(dot3(n, -ray_d)[:, None] >= 0.0, n, -n)
        ngs = jnp.where(dot3(ng, -ray_d)[:, None] >= 0.0, ng, -ng)
        ls = sample_light_rev(scene, l_idx, r_l[:, :3], pos, rows=rows_nee)
        sray_o = offs_ray_pos(pos, ngs, ls.dir)
        f, pdf_fwd = eval_bsdf(p, -ray_d, ls.dir, ns, feats)
        cos_s = jnp.abs(dot3(ls.dir, ns))
        w_l = jnp.where(ls.is_delta, 1.0,
                        mis_weight(ls.pdf_w * ls.pick_prob, pdf_fwd))
        contrib = tp * f * ls.radiance * (
            cos_s * w_l / jnp.maximum(ls.pdf_w * ls.pick_prob, 1e-12))[:, None]
        ok = alive & (cos_s > 0.0) & ~passthru & ~scat
        # zero-contribution lanes need no occlusion query (pt.py's r4
        # shadow-ray drop — keeps the two schedules' ray counters equal)
        need_sh = ok & (contrib.max(axis=-1) > 0.0)
        rays = rays + need_sh.sum()
        if fuse:
            # defer: the occlusion query joins the NEXT body's dispatch
            pend = jnp.concatenate([
                sray_o, ls.dir, ls.dist[:, None],
                jnp.where(need_sh[:, None], contrib, 0.0)], axis=1)
            pend_m = need_sh
        else:
            u_sh = (r_l[:, 0] * 16777216.0).astype(jnp.uint32)
            occluded = shadow_trace(scene, sray_o, ls.dir, ls.dist, need_sh,
                                    u_sh, has_alpha, presorted=sorted_mode)
            acc = acc + jnp.where((need_sh & ~occluded)[:, None], contrib,
                                  0.0)

        r_b = rand_fn(sidx, depth, DG_BSDF)
        bs = sample_bsdf(p, -ray_d, ns, r_b, feats)
        wi = jnp.where(passthru[:, None], ray_d, bs.wi)
        weight = jnp.where(passthru[:, None], 1.0, bs.weight)
        prev_pdf = jnp.where(passthru, 0.0, bs.pdf)
        prev_spec = jnp.where(passthru, True, bs.is_specular)
        if has_back:  # RAY_EVENT_T-only paths stay camera-visible
            pure_t = pure_t & (passthru | bs.is_transmission) & ~scat

        # fog state machine (pt.py semantics: arm on entry, clear on exit)
        if has_fog:
            beer = alive & (p.fog_mult > 0.0) & ~passthru
            f_enter = beer & bs.is_transmission & front
            f_leave = beer & bs.is_transmission & ~front
            armed = jnp.concatenate([p.fog_color, p.fog_mult[:, None]], 1)
            fog_state = jnp.where(f_enter[:, None], armed,
                                  jnp.where(f_leave[:, None], 0.0, fog_state))

        # SSS boundary event (pt.py / CPUExp_IntegratorSSS.cpp:36): the
        # direction/weight/pdf ride the REGULAR lobe mixture — the folded
        # effective lobes (dc = kd(1-T), tl = (1-kd)T, bsdf/core.py:164-176)
        # keep sample/eval/NEE/env-MIS pdfs mutually consistent (see pt.py's
        # note on the MIS surplus a custom T-branch sampler caused). Only the
        # medium STATE toggles here: the translucency lobe crosses the
        # boundary — entering on front hits, exiting on back hits.
        if has_sss:
            is_sss = alive & ~scat & ~passthru & (p.sss_transmission > 0.0)
            cross = is_sss & bs.is_diff_trans
            m_enter = cross & front
            m_exit = cross & ~front
            in_med = jnp.where(m_enter, True, jnp.where(m_exit, False, in_med))
            med_sig_s = jnp.where(m_enter, p.sss_density * p.sss_scattering,
                                  jnp.where(m_exit, 0.0, med_sig_s))
            med_sig_a = jnp.where(m_enter[:, None],
                                  p.sss_density[:, None] * p.sss_absorption,
                                  jnp.where(m_exit[:, None], 0.0, med_sig_a))
            med_g = jnp.where(m_enter, p.sss_phase, med_g)
            weight = jnp.where(scat[:, None], 1.0, weight)
        tp = tp * weight

        # russian roulette from min_rr_depth (traced depth)
        q = jnp.clip(tp.max(axis=-1), 0.05, 1.0)
        u_rr = rand_fn(sidx, depth, DG_RR)[:, 0]
        rr_on = depth >= min_rr_depth
        kill = rr_on & (u_rr >= q)
        tp = jnp.where(rr_on[:, None], tp / q[:, None], tp)
        alive = alive & ~kill & (tp.max(axis=-1) > 1e-7)

        n_off = jnp.where((bs.is_transmission | passthru)[:, None],
                          -ngs, ngs)
        ray_o = offs_ray_pos(pos, n_off, wi)
        if has_sss:  # scattered lanes continue from inside the medium
            ray_o = jnp.where(scat[:, None], pos_scat, ray_o)
            wi = jnp.where(scat[:, None], hg_dir, wi)
            prev_spec = jnp.where(scat, True, prev_spec)
            prev_pdf = jnp.where(scat, 0.0, prev_pdf)
            med = jnp.concatenate([
                in_med.astype(f32)[:, None], med_sig_s[:, None],
                med_sig_a, med_g[:, None]], axis=1)
        ray_d = wi
        depth = depth + 1

        # ---- 4. death splat: finished samples write their (clamped)
        # radiance to the framebuffer — one deterministic scatter-add
        if fuse:
            # a lane splats once its radiance is final: dead with no NEW
            # pending query, and it either died this body or sat dead
            # waiting for the pend that just resolved
            dying = ~alive & ~pend_m & (was_alive | pend_entry)
        else:
            dying = was_alive & ~alive
        cl = scene.settings.clamp if scene.settings is not None else 1e6
        fb = s["fb"].at[pix].add(
            jnp.where(dying[:, None], jnp.clip(acc, 0.0, cl), 0.0))

        out = dict(next_ctr=next_ctr, fb=fb, rays=rays, pix=pix,
                   sidx=sidx, depth=depth, ray_o=ray_o, ray_d=ray_d, tp=tp,
                   acc=acc, prev_pdf=prev_pdf, prev_spec=prev_spec,
                   alive=alive)
        if has_fog:
            out["fog"] = fog_state
        if has_back:
            out["pure_t"] = pure_t
        if has_sss:
            out["med"] = med
        if fuse:
            out["pend"], out["pend_m"] = pend, pend_m
        return out

    def cond(s):
        live = s["alive"].any() | (s["next_ctr"] < total)
        if fuse:  # drain the last pending occlusion queries
            live = live | s["pend_m"].any()
        return live

    out = jax.lax.while_loop(cond, body, init_state())
    return out["fb"].reshape(H, W, 3), out["rays"]
