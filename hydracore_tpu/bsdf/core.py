"""BSDF sample/eval library — vectorized over ray batches.

TPU-native re-design of hydra_drv/cmaterial.h (3.8k LoC of per-BRDF
*_SampleAndEvalBRDF / *_EvalBxDF / *_EvalPDF plus the blend-tree random walk
materialRandomWalkBRDF:2345). Instead of a data-dependent walk over material
pages, every material is a fixed 4-lobe record (emission/diffuse/
reflection/transparency, scene/materials.py) and shading is ONE-SAMPLE MIS
over lobes: evaluation sums all non-delta lobes branch-free; sampling picks
a lobe proportionally to its luminance and divides by the mixture pdf.

Conventions:
  wo — unit vector from surface TOWARD the viewer (= -ray_dir)
  wi — unit vector from surface toward light / next vertex
  n  — geometric-consistent shading normal as stored (NOT pre-flipped)
All functions take/return (R, ...) batches.
"""
from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from hydracore_tpu.scene.materials import (
    REFL_BECKMANN,
    REFL_GGX,
    REFL_MIRROR,
    REFL_NONE,
    REFL_PHONG,
)
from hydracore_tpu.utils.math3d import (
    dot3,
    make_orthonormal_basis,
    normalize3,
    reflect3,
)

INV_PI = float(1.0 / np.pi)
EPS_PDF = 1e-20


class MatParams(NamedTuple):
    """Per-ray material parameters after texture fetch."""

    em_color: jnp.ndarray  # (R,3)
    diff_color: jnp.ndarray  # (R,3)
    diff_rough: jnp.ndarray  # (R,)
    refl_color: jnp.ndarray  # (R,3)
    refl_cospow: jnp.ndarray  # (R,)
    refl_alpha: jnp.ndarray  # (R,)
    refl_dist: jnp.ndarray  # (R,) int
    fresnel_ior: jnp.ndarray  # (R,)
    fresnel_on: jnp.ndarray  # (R,)
    transp_color: jnp.ndarray  # (R,3)
    transp_ior: jnp.ndarray  # (R,)
    thin_walled: jnp.ndarray  # (R,) int
    opacity: jnp.ndarray  # (R,) alpha in [0,1]
    light_id: jnp.ndarray  # (R,) int
    bump_tex: jnp.ndarray  # (R,) normal-map slot (0 = none)
    transl_color: jnp.ndarray  # (R,3) diffuse transmission
    transp_alpha: jnp.ndarray  # (R,) rough-glass microfacet alpha (0=delta)
    refl_aniso: jnp.ndarray  # (R,)
    refl_aniso_rot: jnp.ndarray  # (R,)
    skip_shadow: jnp.ndarray  # (R,) shadow-catcher opacity flag
    # subsurface scattering (SSSMaterial semantics,
    # PlainMaterialConverter.cpp:716 / CPUExp_IntegratorSSS.cpp)
    sss_density: jnp.ndarray = None  # (R,)
    sss_absorption: jnp.ndarray = None  # (R,3)
    sss_scattering: jnp.ndarray = None  # (R,)
    sss_phase: jnp.ndarray = None  # (R,)
    sss_transmission: jnp.ndarray = None  # (R,)
    # thick-glass Beer fog (attenuationStep, cmaterial.h:2787-2827)
    fog_color: jnp.ndarray = None  # (R,3)
    fog_mult: jnp.ndarray = None  # (R,)
    # baked normal-map tex_meta row (materials.MA_META_BUMP) — bitcast ints
    # inside: blend combination must SWITCH, never lerp
    bump_meta: jnp.ndarray = None  # (R,12)
    # normal-map RGB prefetched by _fetch_leaf's stacked channel gather
    # (rides the same (K*R) heap gather as the color channels); like
    # bump_meta it must SWITCH at blend combine, never lerp
    bump_rgb: jnp.ndarray = None  # (R,3)


def luminance(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


FEATS_ALL = ("glass", "transl", "aniso", "mscomp")


def scene_feats(scene) -> tuple:
    """Static material-feature set for this scene — lets jit drop unused
    lobe code (compile-size guard; semantics unchanged since the flags are
    derived from the material table)."""
    st = scene.settings
    if st is None:
        return FEATS_ALL
    out = []
    if getattr(st, "has_rough_glass", True):
        out.append("glass")
    if getattr(st, "has_transl", True):
        out.append("transl")
    if getattr(st, "has_aniso", True):
        out.append("aniso")
    if getattr(st, "has_ms_comp", True):
        out.append("mscomp")
    return tuple(out)


def _gate(st, name: str) -> bool:
    """Static feature gate; permissive when settings are absent."""
    return True if st is None else bool(getattr(st, name, True))


def _fetch_leaf(scene, mat_id, uv, pos=None, normal=None, wo=None,
                ao=None) -> MatParams:
    """ONE packed-row gather (scene.mat_attr) + statically-gated texture
    fetches. Gather cost on this TPU is per-OP (tools/exp_gather.py), so the
    ~25 per-field gathers of the naive SoA fetch collapse into one; texture
    channels read their tex_meta from the BAKED row block (bake_tex_meta) —
    no second gather per channel."""
    from hydracore_tpu.ops.gather import gather_rows
    from hydracore_tpu.ops.texture import (tex_fetch_row,
                                           tex_fetch_rows_batch)
    from hydracore_tpu.scene import materials as MC

    st = scene.settings
    # small-table select-chain beats the serialized XLA gather (ops/gather)
    m = gather_rows(scene.mat_attr, mat_id)  # (R, MA_WIDTH_FULL)

    def col(c):
        return m[:, c]

    def col3(c):
        return m[:, c:c + 3]

    def coli(c):
        return m[:, c].astype(jnp.int32)

    # ---- stacked channel fetch (HYDRA_TEXFUSE, default OFF): heap-gather
    # cost on this TPU scales per-ROW, not per-op (tools/exp_gather_fuse.py:
    # 4 separate (R,16) quad gathers 17.9 ms vs one (4R,16) batch 22.1 ms at
    # R=256k — the stacked uv/meta concats only add cost). Kept as a knob
    # for re-pricing; bit-identical either way.
    fuse_tex = _os.environ.get("HYDRA_TEXFUSE", "0") == "1"
    chans = []
    if _gate(st, "has_em_tex"):
        chans.append(("em", MC.MA_META_EM))
    if _gate(st, "has_diff_tex"):
        chans.append(("diff", MC.MA_META_DIFF))
    if _gate(st, "has_refl_tex"):
        chans.append(("refl", MC.MA_META_REFL))
    if _gate(st, "has_alpha"):
        chans.append(("op", MC.MA_META_OPACITY))
    if _gate(st, "has_transl") and _gate(st, "has_transl_tex"):
        chans.append(("transl", MC.MA_META_TRANSL))
    if fuse_tex and _gate(st, "has_bump"):
        chans.append(("bump", MC.MA_META_BUMP))
    if fuse_tex and chans:
        outs = tex_fetch_rows_batch(scene,
                                    [m[:, c:c + 12] for _, c in chans], uv)
        fetched = {nm: o for (nm, _), o in zip(chans, outs)}
    else:
        fetched = {nm: tex_fetch_row(scene, m[:, c:c + 12], uv)
                   for nm, c in chans}

    def tex_rgb(name):
        return fetched[name][:, :3] if name in fetched else 1.0

    em = col3(MC.MA_EM) * tex_rgb("em")
    dc = col3(MC.MA_DIFF) * tex_rgb("diff")
    sss_on = _gate(st, "has_sss") if st is not None else False

    from hydracore_tpu.ops.proctex import eval_proc_tex, num_proc_tex

    if pos is not None and num_proc_tex() > 0 and _gate(st, "has_proc_tex"):
        proc = coli(MC.MA_DIFF_PROC)
        nn = normal if normal is not None else jnp.zeros_like(pos)
        pargs = m[:, MC.MA_PROC_ARGS:MC.MA_PROC_ARGS + 8]
        dc = dc * jnp.where((proc >= 0)[:, None],
                            eval_proc_tex(proc, uv, pos, nn, wo=wo,
                                          args=pargs, scene=scene,
                                          ao=ao), 1.0)
    rc = col3(MC.MA_REFL) * tex_rgb("refl")
    if "op" in fetched:
        op = fetched["op"][:, 0]
    else:
        op = jnp.ones(uv.shape[0], jnp.float32)
    tg = col(MC.MA_TRANSP_GLOSS)
    tl = col3(MC.MA_TRANSL)
    if _gate(st, "has_transl"):
        tl = tl * tex_rgb("transl")
    if sss_on:
        # SSS boundary event as effective lobes (the reference's branch
        # probabilities, CPUExp_IntegratorSSS.cpp:69-97: transmit w.p. T
        # with color 1-kd, else diffuse-reflect with color kd) — mapping it
        # onto the diffuse + translucency lobes keeps NEE and MIS pdfs
        # consistent with sampling:
        T = col(MC.MA_SSS_TRANSMISSION)
        is_sss = T > 0.0
        kd = dc
        dc = jnp.where(is_sss[:, None], kd * (1.0 - T)[:, None], dc)
        tl = jnp.where(is_sss[:, None],
                       jnp.clip(1.0 - kd, 0.0, 1.0) * T[:, None], tl)
    return MatParams(
        em_color=em,
        diff_color=dc,
        diff_rough=col(MC.MA_DIFF_ROUGH),
        refl_color=rc,
        refl_cospow=col(MC.MA_REFL_COSPOW),
        refl_alpha=col(MC.MA_REFL_ALPHA),
        refl_dist=coli(MC.MA_REFL_DIST),
        fresnel_ior=col(MC.MA_FRESNEL_IOR),
        fresnel_on=col(MC.MA_FRESNEL_ON),
        transp_color=col3(MC.MA_TRANSP),
        transp_ior=col(MC.MA_TRANSP_IOR),
        thin_walled=coli(MC.MA_THIN_WALLED),
        opacity=op,
        light_id=coli(MC.MA_LIGHT_ID),
        bump_tex=coli(MC.MA_BUMP_TEX),
        transl_color=tl,
        transp_alpha=jnp.where(tg < 0.999,
                               jnp.maximum(1.0 - tg, 1e-3), 0.0),
        refl_aniso=col(MC.MA_REFL_ANISO),
        refl_aniso_rot=col(MC.MA_REFL_ANISO_ROT),
        skip_shadow=coli(MC.MA_SKIP_SHADOW),
        sss_density=col(MC.MA_SSS_DENSITY) if _gate(st, "has_sss") else None,
        sss_absorption=col3(MC.MA_SSS_ABSORPTION) if _gate(st, "has_sss") else None,
        sss_scattering=col(MC.MA_SSS_SCATTERING) if _gate(st, "has_sss") else None,
        sss_phase=col(MC.MA_SSS_PHASE) if _gate(st, "has_sss") else None,
        sss_transmission=col(MC.MA_SSS_TRANSMISSION) if _gate(st, "has_sss") else None,
        fog_color=col3(MC.MA_FOG_COLOR) if _gate(st, "has_fog") else None,
        fog_mult=col(MC.MA_FOG_MULT) if _gate(st, "has_fog") else None,
        bump_meta=(m[:, MC.MA_META_BUMP:MC.MA_META_BUMP + 12]
                   if _gate(st, "has_bump") else None),
        bump_rgb=(fetched["bump"][:, :3] if "bump" in fetched else None),
    )


def _blend_weight(scene, mrow, uv, normal, wo, pos):
    """Per-ray top weight of a blend record (mask-texture luminance /
    view-angle Fresnel / falloff — BlendMaskMaterial semantics,
    PlainMaterialConverter.cpp:750)."""
    from hydracore_tpu.ops.texture import tex_fetch_row
    from hydracore_tpu.scene import materials as MC

    btype = mrow[:, MC.MA_BLEND_TYPE].astype(jnp.int32)
    mask = tex_fetch_row(scene,
                         mrow[:, MC.MA_META_BLEND:MC.MA_META_BLEND + 12],
                         uv)[:, :3]
    w_mask = luminance(mask)
    if normal is not None and wo is not None:
        cos_v = jnp.abs(dot3(normal, wo))
    elif normal is not None and pos is not None:
        cos_v = jnp.abs(dot3(normal, normalize3(pos)))
    else:
        cos_v = jnp.full(w_mask.shape, 0.5)
    w_fres = fresnel_dielectric(
        cos_v, jnp.maximum(mrow[:, MC.MA_BLEND_IOR], 1.0 + 1e-4))
    w_fall = 1.0 - cos_v
    w = jnp.where(btype == 2, w_fres, jnp.where(btype == 3, w_fall, w_mask))
    return jnp.clip(w, 0.0, 1.0)


def resolve_blend_leaf(scene, mat_id, uv, normal, wo, pos, u_blend):
    """Stochastic blend-tree descent — the vectorized equivalent of
    materialRandomWalkBRDF (cmaterial.h:2345): at each blend record take
    the top branch w.p. its blend weight (re-normalizing the uniform), else
    the bottom, until a leaf record. Bounded by the scene's static
    blend_depth. Unbiased: sampling branch k w.p. w_k and evaluating leaf k
    alone estimates the mixture exactly."""
    from hydracore_tpu.scene import materials as MC

    st = scene.settings
    levels = 1 if st is None else max(int(getattr(st, "blend_depth", 1)), 1)
    mid = mat_id
    u = u_blend
    done = jnp.zeros(mat_id.shape, bool)
    from hydracore_tpu.ops.gather import gather_rows

    for _ in range(levels):
        mrow = gather_rows(scene.mat_attr, mid)
        bn = mrow[:, MC.MA_BLEND_NODE].astype(jnp.int32)
        bt = mrow[:, MC.MA_BLEND_TOP].astype(jnp.int32)
        is_blend = (bn >= 0) | (bt >= 0)
        w = _blend_weight(scene, mrow, uv, normal, wo, pos)
        take_top = u < w
        # re-normalize the uniform for the next level (stream reuse)
        u = jnp.clip(jnp.where(take_top, u / jnp.maximum(w, 1e-6),
                               (u - w) / jnp.maximum(1.0 - w, 1e-6)),
                     0.0, 1.0 - 1e-7)
        nxt = jnp.where(take_top, jnp.where(bt >= 0, bt, mid), bn)
        resolved = ~is_blend | (take_top & (bt < 0))
        mid = jnp.where(done | resolved, mid, jnp.where(take_top & (bt < 0), mid, nxt))
        done = done | resolved
    return mid


def fetch_material(scene, mat_id, uv, pos=None, normal=None, wo=None,
                   u_blend=None, ao=None) -> MatParams:
    """Gather material record + modulate by textures (ref: materialLeafEval
    texture fetch path via SWTexSampler, cmaterial.h/cfetch.h). Registered
    procedural textures (ops/proctex.py) modulate the diffuse color when
    `pos` is supplied.

    Blend materials (PlainMaterialConverter.cpp:750 BlendMask): the record
    holds the TOP leaf; blend_node points at the bottom leaf; the per-ray
    top weight comes from the blend type — mask texture luminance, Fresnel
    of the view angle, or falloff — and the two leaves are lerped
    field-wise (ints switch at w=0.5). The vectorized equivalent of
    materialRandomWalkBRDF's tree descent for one-level trees."""
    st = scene.settings
    # static fast path: no blend materials in the scene -> single fetch
    if st is not None and not st.has_blend:
        return _fetch_leaf(scene, mat_id, uv, pos, normal, wo, ao)
    # N-level blend trees: stochastic random walk to ONE leaf per ray
    # (materialRandomWalkBRDF, cmaterial.h:2345). 1-level scenes keep the
    # deterministic two-leaf lerp below (lower variance).
    if st is not None and getattr(st, "blend_depth", 1) > 1:
        if u_blend is None:
            u_blend = jnp.full(mat_id.shape, 0.5, jnp.float32)
        leaf = resolve_blend_leaf(scene, mat_id, uv, normal, wo, pos, u_blend)
        return _fetch_leaf(scene, leaf, uv, pos, normal, wo, ao)
    p_top = _fetch_leaf(scene, mat_id, uv, pos, normal, wo, ao)
    from hydracore_tpu.ops.gather import gather_rows
    from hydracore_tpu.scene import materials as MC

    mrow = gather_rows(scene.mat_attr, mat_id)
    bn = mrow[:, MC.MA_BLEND_NODE].astype(jnp.int32)
    has = bn >= 0
    bot_id = jnp.where(has, jnp.clip(bn, 0, scene.mat_attr.shape[0] - 1), mat_id)
    p_bot = _fetch_leaf(scene, bot_id, uv, pos, normal, wo, ao)

    w = jnp.where(has, _blend_weight(scene, mrow, uv, normal, wo, pos), 1.0)

    def lerp(name, a, b):
        if a is None or b is None:
            return a if b is None else b
        if name.endswith("_meta") or name == "bump_rgb":
            # baked tex rows hold bitcast ints; the prefetched bump rgb
            # must follow its meta: switch, never lerp
            return jnp.where((w >= 0.5)[:, None], a, b)
        if a.ndim == 2:
            return a * w[:, None] + b * (1.0 - w[:, None])
        if a.dtype in (jnp.int32, jnp.uint32):
            return jnp.where(w >= 0.5, a, b)
        return a * w + b * (1.0 - w)

    return MatParams(*[lerp(f, a, b)
                       for f, a, b in zip(MatParams._fields, p_top, p_bot)])


def apply_bump(scene, p: MatParams, n, tang, uv):
    """Perturb the shading normal by the material's normal map — the shading
    side of the reference bump pipeline (aux normal map applied in
    ComputeHit/Shade via the TBN frame). tang: interpolated mesh tangent."""
    from hydracore_tpu.ops.texture import tex_fetch_row

    if not _gate(scene.settings, "has_bump"):
        return n
    has = p.bump_tex > 0
    if p.bump_rgb is not None:  # prefetched by _fetch_leaf's stacked gather
        nm = p.bump_rgb * 2.0 - 1.0
    else:
        nm = tex_fetch_row(scene, p.bump_meta, uv)[:, :3] * 2.0 - 1.0
    t = normalize3(tang - dot3(tang, n)[:, None] * n)
    b = jnp.stack(
        [
            n[:, 1] * t[:, 2] - n[:, 2] * t[:, 1],
            n[:, 2] * t[:, 0] - n[:, 0] * t[:, 2],
            n[:, 0] * t[:, 1] - n[:, 1] * t[:, 0],
        ],
        -1,
    )
    n2 = normalize3(nm[:, 0:1] * t + nm[:, 1:2] * b + nm[:, 2:3] * n)
    return jnp.where(has[:, None], n2, n)


# ----------------------------------------------------------------------------
# Fresnel
# ----------------------------------------------------------------------------

def fresnel_dielectric(cos_i, eta):
    """Exact dielectric Fresnel (unpolarized). cos_i >= 0, eta = n_t/n_i."""
    cos_i = jnp.clip(cos_i, 0.0, 1.0)
    sin2_t = jnp.maximum(0.0, 1.0 - cos_i * cos_i) / jnp.maximum(eta * eta, 1e-12)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    r_par = (eta * cos_i - cos_t) / jnp.maximum(eta * cos_i + cos_t, 1e-12)
    r_perp = (cos_i - eta * cos_t) / jnp.maximum(cos_i + eta * cos_t, 1e-12)
    f = 0.5 * (r_par * r_par + r_perp * r_perp)
    return jnp.where(tir, 1.0, jnp.clip(f, 0.0, 1.0))


# ----------------------------------------------------------------------------
# Lobe evaluation helpers (all non-delta)
# ----------------------------------------------------------------------------

def _orennayar_factor(rough, n, wo, wi, cos_o, cos_i):
    """Oren–Nayar qualitative model factor (sigma = rough in [0,1])."""
    sigma2 = rough * rough
    A = 1.0 - 0.5 * sigma2 / (sigma2 + 0.33)
    B = 0.45 * sigma2 / (sigma2 + 0.09)
    # cos(phi_i - phi_o) via projections onto the tangent plane
    to = normalize3(wo - cos_o[..., None] * n)
    ti = normalize3(wi - cos_i[..., None] * n)
    cos_dphi = jnp.maximum(dot3(to, ti), 0.0)
    sin_a = jnp.sqrt(jnp.clip(1.0 - jnp.minimum(cos_o, cos_i) ** 2, 0.0, 1.0))
    tan_b = jnp.sqrt(jnp.clip(1.0 - jnp.maximum(cos_o, cos_i) ** 2, 0.0, 1.0)) / jnp.maximum(
        jnp.maximum(cos_o, cos_i), 1e-4
    )
    return A + B * cos_dphi * sin_a * tan_b


def _ggx_d(cos_h, alpha):
    a2 = alpha * alpha
    d = cos_h * cos_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(np.pi * d * d, 1e-12)


def _ggx_g1(cos_v, alpha):
    a2 = alpha * alpha
    return 2.0 * cos_v / jnp.maximum(cos_v + jnp.sqrt(a2 + (1.0 - a2) * cos_v * cos_v), 1e-12)


def _beckmann_d(cos_h, alpha):
    c2 = jnp.maximum(cos_h * cos_h, 1e-8)
    a2 = jnp.maximum(alpha * alpha, 1e-8)
    t2 = (1.0 - c2) / c2
    return jnp.exp(-t2 / a2) / jnp.maximum(np.pi * a2 * c2 * c2, 1e-12)


def _lobe_weights(p: MatParams, wo, n):
    """Mixture probabilities (kd, ks, kt, kl) for one-sample lobe selection
    (diffuse / glossy-mirror / glass / translucent)."""
    cos_o = jnp.abs(dot3(wo, n))
    kd = luminance(p.diff_color)
    f_apx = jnp.where(
        p.fresnel_on > 0.5, fresnel_dielectric(cos_o, jnp.maximum(p.fresnel_ior, 1.0 + 1e-4)), 1.0
    )
    ks = luminance(p.refl_color) * jnp.where(p.fresnel_on > 0.5, jnp.maximum(f_apx, 0.1), 1.0)
    kt = luminance(p.transp_color)
    kl = luminance(p.transl_color)
    total = kd + ks + kt + kl
    safe = jnp.maximum(total, EPS_PDF)
    return kd / safe, ks / safe, kt / safe, kl / safe, total


_GGX_E = None


def _ggx_energy_tables():
    """(E (64,64), E_avg (64,)) as jnp constants — the reference fetches the
    baked GGX2017 multiscatter table per shade (cfetch.h:78, cmaterial.h
    GetMultiscatteringFrom2dTable)."""
    global _GGX_E
    if _GGX_E is None:
        from hydracore_tpu.bsdf.energy_tables import get_ggx_albedo_table
        E = np.asarray(get_ggx_albedo_table(), np.float32)  # rows alpha, cols mu
        mu = (np.arange(E.shape[1]) + 0.5) / E.shape[1]
        e_avg = 2.0 * (E * mu[None, :]).mean(axis=1)  # int 2 mu E dmu
        # cache NUMPY (a cached jnp array born inside a trace would leak)
        _GGX_E = (E, e_avg.astype(np.float32))
    return jnp.asarray(_GGX_E[0]), jnp.asarray(_GGX_E[1])


def _ggx_E(alpha, mu):
    E, _ = _ggx_energy_tables()
    n = E.shape[0]
    ai = jnp.clip((alpha * n - 0.5).astype(jnp.int32), 0, n - 1)
    mi = jnp.clip((mu * n - 0.5).astype(jnp.int32), 0, n - 1)
    return E[ai, mi]


def _ggx_E_avg(alpha):
    _, ea = _ggx_energy_tables()
    n = ea.shape[0]
    ai = jnp.clip((alpha * n - 0.5).astype(jnp.int32), 0, n - 1)
    return ea[ai]


_TRANSP_E = None


def _transp_energy_table():
    """64^3 rough-dielectric directional albedo E(ior, alpha, mu) — the
    reference's m_essTranspTable (cfetch.h:79, bakeBrdfEnergy/)."""
    global _TRANSP_E
    if _TRANSP_E is None:
        from hydracore_tpu.bsdf.energy_tables import get_transp_albedo_table
        _TRANSP_E = np.asarray(get_transp_albedo_table(), np.float32)
    return jnp.asarray(_TRANSP_E)


def _transp_ms_factor(alpha, mu, ior, color):
    """Pms = 1 + color*(1-Ess)/Ess of GetMultiscatteringFrom3dTable
    (cmaterial.h:161-196); identity outside the baked ior range [0.42,2.4]."""
    from hydracore_tpu.bsdf.energy_tables import (TRANSP_IOR_MAX,
                                                  TRANSP_IOR_MIN)
    E3 = _transp_energy_table()
    n = E3.shape[0]
    zf = (ior - TRANSP_IOR_MIN) / (TRANSP_IOR_MAX - TRANSP_IOR_MIN)
    zi = jnp.clip((zf * n - 0.5).astype(jnp.int32), 0, n - 1)
    ai = jnp.clip((alpha * n - 0.5).astype(jnp.int32), 0, n - 1)
    mi = jnp.clip((mu * n - 0.5).astype(jnp.int32), 0, n - 1)
    Ess = jnp.maximum(E3[zi, ai, mi], 1e-3)
    pms = 1.0 + color * ((1.0 - Ess) / Ess)[..., None]
    in_range = (ior >= TRANSP_IOR_MIN) & (ior <= TRANSP_IOR_MAX)
    return jnp.where(in_range[..., None], pms, 1.0)


def _aniso_frame(ns, rot):
    """Tangent frame for anisotropy, rotated by `rot` turns about ns."""
    t, b = make_orthonormal_basis(ns)
    c = jnp.cos(2.0 * np.pi * rot)[..., None]
    sn = jnp.sin(2.0 * np.pi * rot)[..., None]
    return c * t + sn * b, -sn * t + c * b


def _ggx_d_aniso(h, ns, t, b, ax, ay):
    hx = dot3(h, t)
    hy = dot3(h, b)
    hz = jnp.maximum(dot3(h, ns), 0.0)
    d = hx * hx / jnp.maximum(ax * ax, 1e-12) \
        + hy * hy / jnp.maximum(ay * ay, 1e-12) + hz * hz
    return 1.0 / jnp.maximum(np.pi * ax * ay * d * d, 1e-12)


def _eval_glossy(p: MatParams, wo, wi, ns, cos_o, cos_i, aniso=True,
                 mscomp=True):
    """Evaluate the (non-delta, reflective) glossy lobe: phong / ggx / beckmann.
    Returns (f (R,3), pdf (R,)) — zero for mirror/none."""
    h = normalize3(wo + wi)
    cos_h = jnp.maximum(dot3(ns, h), 0.0)
    cos_oh = jnp.maximum(dot3(wo, h), 1e-6)

    # phong
    r = reflect3(-wo, ns)
    cos_r = jnp.maximum(dot3(r, wi), 0.0)
    pw = p.refl_cospow
    phong_f = (pw + 2.0) * (0.5 * INV_PI) * jnp.power(cos_r, pw)
    phong_pdf = (pw + 1.0) * (0.5 * INV_PI) * jnp.power(cos_r, pw)

    # ggx (Smith separable G); anisotropic D when requested (TRGGX,
    # PlainMaterialConverter.cpp:568)
    d_ggx = _ggx_d(cos_h, p.refl_alpha)
    if aniso:
        ax = p.refl_alpha * (1.0 + p.refl_aniso)
        ay = p.refl_alpha * jnp.maximum(1.0 - p.refl_aniso, 1e-3)
        ta, ba = _aniso_frame(ns, p.refl_aniso_rot)
        d_an = _ggx_d_aniso(h, ns, ta, ba, ax, ay)
        d_ggx = jnp.where(p.refl_aniso > 1e-3, d_an, d_ggx)
    g = _ggx_g1(cos_o, p.refl_alpha) * _ggx_g1(cos_i, p.refl_alpha)
    ggx_f = d_ggx * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6)
    # Kulla-Conty multiscatter compensation from the baked albedo table
    # (static skip when no rough-GGX materials exist: mscomp feat)
    if mscomp:
        E_o = _ggx_E(p.refl_alpha, cos_o)
        E_i = _ggx_E(p.refl_alpha, jnp.maximum(cos_i, 1e-3))
        E_avg = _ggx_E_avg(p.refl_alpha)
        f_ms = (1.0 - E_o) * (1.0 - E_i) / jnp.maximum(
            np.pi * (1.0 - E_avg), 1e-3)
        ggx_f = ggx_f + jnp.where(p.refl_alpha > 0.05, f_ms, 0.0)
    ggx_pdf = d_ggx * cos_h / (4.0 * cos_oh)

    # beckmann (use ggx G as approximation for shadowing)
    d_b = _beckmann_d(cos_h, p.refl_alpha)
    b_f = d_b * g / jnp.maximum(4.0 * cos_o * cos_i, 1e-6)
    b_pdf = d_b * cos_h / (4.0 * cos_oh)

    dist = p.refl_dist
    f_scalar = jnp.where(
        dist == REFL_PHONG, phong_f,
        jnp.where(dist == REFL_GGX, ggx_f, jnp.where(dist == REFL_BECKMANN, b_f, 0.0)),
    )
    pdf = jnp.where(
        dist == REFL_PHONG, phong_pdf,
        jnp.where(dist == REFL_GGX, ggx_pdf, jnp.where(dist == REFL_BECKMANN, b_pdf, 0.0)),
    )
    fres = jnp.where(
        p.fresnel_on > 0.5,
        fresnel_dielectric(cos_oh, jnp.maximum(p.fresnel_ior, 1.0 + 1e-4)),
        1.0,
    )
    valid = (cos_i > 0.0) & (cos_o > 0.0) & (dist != REFL_MIRROR) & (dist != REFL_NONE)
    f = jnp.where(valid[..., None], (f_scalar * fres)[..., None] * p.refl_color, 0.0)
    pdf = jnp.where(valid, pdf, 0.0)
    return f, pdf


def eval_bsdf(p: MatParams, wo, wi, n, feats=FEATS_ALL):
    """Evaluate all non-delta lobes + mixture pdf (for NEE / MIS).

    Ref semantics: materialEval (cmaterial.h:2554) — returns
    (f (R,3), pdf_fwd (R,)). Reflection-side only (transmission eval comes
    with rough glass)."""
    facing = dot3(n, wo) >= 0.0
    ns = jnp.where(facing[..., None], n, -n)  # face the viewer
    cos_o = jnp.maximum(dot3(ns, wo), 0.0)
    cos_i = dot3(ns, wi)

    kd, ks, kt, kl, total = _lobe_weights(p, wo, ns)
    refl_side = cos_i > 0.0
    trans_side = cos_i < 0.0

    # diffuse
    on = _orennayar_factor(p.diff_rough, ns, wo, wi, cos_o, jnp.maximum(cos_i, 0.0))
    diff_factor = jnp.where(p.diff_rough > 1e-5, on, 1.0)
    f_d = jnp.where(
        refl_side[..., None], p.diff_color * (INV_PI * diff_factor)[..., None], 0.0
    )
    pdf_d = jnp.where(refl_side, jnp.maximum(cos_i, 0.0) * INV_PI, 0.0)

    f_s, pdf_s = _eval_glossy(p, wo, wi, ns, cos_o, jnp.maximum(cos_i, 0.0),
                              aniso="aniso" in feats,
                              mscomp="mscomp" in feats)
    f_s = jnp.where(refl_side[..., None], f_s, 0.0)
    pdf_s = jnp.where(refl_side, pdf_s, 0.0)

    # translucency: Lambert transmission (ref Translucent,
    # PlainMaterialConverter.cpp:182)
    if "transl" in feats:
        f_l = jnp.where(trans_side[..., None], p.transl_color * INV_PI, 0.0)
        pdf_l = jnp.where(trans_side, jnp.abs(cos_i) * INV_PI, 0.0)
    else:
        f_l = jnp.zeros_like(f_s)
        pdf_l = jnp.zeros_like(pdf_s)

    # rough glass: GGX microfacet transmission + reflection (Walter 2007;
    # ref Glass, PlainMaterialConverter.cpp:359). Delta glass (alpha 0)
    # stays a specular lobe handled by sample_bsdf.
    if "glass" not in feats:
        alive = total > EPS_PDF
        f = jnp.where(alive[..., None], f_d + f_s + f_l, 0.0)
        pdf = jnp.where(alive, kd * pdf_d + ks * pdf_s + kl * pdf_l, 0.0)
        return f, pdf

    rough_glass = (p.transp_alpha > 1e-4) & (p.thin_walled == 0)
    eta = jnp.where(facing, p.transp_ior, 1.0 / jnp.maximum(p.transp_ior, 1e-4))
    a_t = jnp.maximum(p.transp_alpha, 1e-3)
    # transmission half vector: ht ∝ -(wo + eta * wi), oriented along ns
    ht = -(wo + eta[..., None] * wi)
    ht = normalize3(ht)
    ht = jnp.where(dot3(ht, ns)[..., None] < 0.0, -ht, ht)
    woh_t = dot3(wo, ht)
    wih_t = dot3(wi, ht)
    F_t = fresnel_dielectric(jnp.abs(woh_t), eta)
    d_t = _ggx_d(jnp.maximum(dot3(ht, ns), 0.0), a_t)
    g_t = _ggx_g1(cos_o, a_t) * _ggx_g1(jnp.abs(cos_i), a_t)
    denom_t = woh_t + eta * wih_t
    jac_t = eta * eta * jnp.abs(wih_t) / jnp.maximum(denom_t * denom_t, 1e-9)
    f_gt_s = (jnp.abs(woh_t * wih_t) / jnp.maximum(cos_o * jnp.abs(cos_i), 1e-6)
              * eta * eta * (1.0 - F_t) * d_t * g_t
              / jnp.maximum(denom_t * denom_t, 1e-9))
    f_gt = jnp.where((rough_glass & trans_side)[..., None],
                     p.transp_color * f_gt_s[..., None], 0.0)
    pdf_gt = jnp.where(rough_glass & trans_side,
                       (1.0 - F_t) * d_t * jnp.maximum(dot3(ht, ns), 0.0)
                       * jac_t, 0.0)
    # glass reflection side (same lobe, F weight)
    hr = normalize3(wo + wi)
    woh_r = jnp.maximum(dot3(wo, hr), 1e-6)
    F_r = fresnel_dielectric(woh_r, eta)
    d_r = _ggx_d(jnp.maximum(dot3(hr, ns), 0.0), a_t)
    f_gr_s = d_r * g_t * F_r / jnp.maximum(4.0 * cos_o * jnp.abs(cos_i), 1e-6)
    f_gr = jnp.where((rough_glass & refl_side)[..., None],
                     p.transp_color * f_gr_s[..., None], 0.0)
    pdf_gr = jnp.where(rough_glass & refl_side,
                       F_r * d_r * jnp.maximum(dot3(hr, ns), 0.0)
                       / (4.0 * woh_r), 0.0)

    # multiscatter energy compensation for rough glass from the baked 64^3
    # transp table (ref: Pms in GlassSampleAndEvalBRDF, cmaterial.h:863 —
    # applied to f only; pdfs stay single-scatter so MIS stays consistent)
    if "mscomp" in feats:
        # table z-axis = relative ior n_t/n_i of the wo side = our eta
        # (the reference passes 1/eta because ITS eta is 1/IOR on entry,
        # cmaterial.h:797+863 — same value, opposite bookkeeping)
        pms = _transp_ms_factor(jnp.maximum(p.transp_alpha, 1e-3), cos_o,
                                eta, p.transp_color)
        pms = jnp.where(rough_glass[..., None], pms, 1.0)
        f_gt = f_gt * pms
        f_gr = f_gr * pms

    alive = total > EPS_PDF
    f = jnp.where(alive[..., None], f_d + f_s + f_l + f_gt + f_gr, 0.0)
    pdf = jnp.where(alive, kd * pdf_d + ks * pdf_s + kl * pdf_l
                    + kt * (pdf_gt + pdf_gr), 0.0)
    return f, pdf


class BsdfSample(NamedTuple):
    wi: jnp.ndarray  # (R,3)
    weight: jnp.ndarray  # (R,3) f * |cos| / pdf  (full mixture)
    pdf: jnp.ndarray  # (R,) mixture pdf (0 for delta)
    is_specular: jnp.ndarray  # (R,) bool
    is_transmission: jnp.ndarray  # (R,) bool
    is_diff_trans: jnp.ndarray = None  # (R,) bool: translucency lobe picked
    # (the SSS boundary crossing rides this lobe — integrators toggle the
    # medium state on it; None only from legacy constructors)


def _sample_ggx_h(ns, alpha, u1, u2):
    t, b = make_orthonormal_basis(ns)
    a2 = alpha * alpha
    cos_t2 = (1.0 - u1) / jnp.maximum(1.0 + (a2 - 1.0) * u1, 1e-12)
    cos_t = jnp.sqrt(jnp.clip(cos_t2, 0.0, 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t2, 0.0, 1.0))
    phi = 2.0 * np.pi * u2
    return (
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * ns
    )


def _sample_beckmann_h(ns, alpha, u1, u2):
    t, b = make_orthonormal_basis(ns)
    a2 = jnp.maximum(alpha * alpha, 1e-8)
    tan2 = -a2 * jnp.log(jnp.maximum(1.0 - u1, 1e-12))
    cos_t = 1.0 / jnp.sqrt(1.0 + tan2)
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    phi = 2.0 * np.pi * u2
    return (
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * ns
    )


def _sample_phong_wi(r_dir, pw, u1, u2):
    t, b = make_orthonormal_basis(r_dir)
    cos_t = jnp.power(jnp.maximum(1.0 - u1, 1e-12), 1.0 / (pw + 1.0))
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    phi = 2.0 * np.pi * u2
    return (
        (sin_t * jnp.cos(phi))[..., None] * t
        + (sin_t * jnp.sin(phi))[..., None] * b
        + cos_t[..., None] * r_dir
    )


def sample_bsdf(p: MatParams, wo, n, rands, feats=FEATS_ALL) -> BsdfSample:
    """One-sample-MIS lobe sampling. rands: (R,4) uniforms.

    Ref semantics: MaterialSampleAndEvalBxDF + NextBounce
    (cmaterial.h:2345, material.cl:756): pick lobe ∝ luminance, sample it,
    weight by full mixture (f_total·cos / pdf_total) for glossy+diffuse;
    delta lobes (mirror / glass) return weight = tint / lobe_prob with
    pdf = 0 and is_specular set so the caller uses MIS weight 1.
    """
    facing = dot3(n, wo) >= 0.0
    ns = jnp.where(facing[..., None], n, -n)
    cos_o = jnp.maximum(dot3(ns, wo), 1e-6)

    kd, ks, kt, kl, total = _lobe_weights(p, wo, ns)
    alive = total > EPS_PDF
    u_lobe = rands[:, 0]
    pick_d = u_lobe < kd
    pick_s = (~pick_d) & (u_lobe < kd + ks)
    pick_t = (~pick_d) & (~pick_s) & (u_lobe < kd + ks + kt) & alive
    pick_l = (~pick_d) & (~pick_s) & (~pick_t) & alive

    u1, u2, u3 = rands[:, 1], rands[:, 2], rands[:, 3]

    # --- diffuse: cosine hemisphere around ns
    t, b = make_orthonormal_basis(ns)
    ct = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    st = jnp.sqrt(jnp.clip(1.0 - u1, 0.0, 1.0))
    phi = 2.0 * np.pi * u2
    wi_d = (st * jnp.cos(phi))[..., None] * t + (st * jnp.sin(phi))[..., None] * b + ct[..., None] * ns

    # --- glossy reflection
    dist = p.refl_dist
    is_mirror = dist == REFL_MIRROR
    h_ggx = _sample_ggx_h(ns, p.refl_alpha, u1, u2)
    h_bec = _sample_beckmann_h(ns, p.refl_alpha, u1, u2)
    h = jnp.where((dist == REFL_BECKMANN)[..., None], h_bec, h_ggx)
    wi_micro = reflect3(-wo, h)
    r_dir = reflect3(-wo, ns)
    wi_phong = _sample_phong_wi(r_dir, p.refl_cospow, u1, u2)
    wi_s = jnp.where((dist == REFL_PHONG)[..., None], wi_phong, wi_micro)
    wi_s = jnp.where(is_mirror[..., None], r_dir, wi_s)
    wi_s = normalize3(wi_s)

    # --- transparency (glass): microfacet half-vector when rough
    # (Walter 2007; ref Glass PlainMaterialConverter.cpp:359), the shading
    # normal itself when delta / thin-walled
    entering = facing
    if "glass" in feats:
        rough_glass = (p.transp_alpha > 1e-4) & (p.thin_walled == 0)
        h_glass = _sample_ggx_h(ns, jnp.maximum(p.transp_alpha, 1e-3), u1, u2)
        hh = jnp.where(rough_glass[..., None], h_glass, ns)
        hh = jnp.where(dot3(hh, wo)[..., None] < 0.0, ns, hh)  # degenerate
    else:
        rough_glass = jnp.zeros(facing.shape, bool)
        hh = ns
    eta_pair = jnp.where(entering, p.transp_ior, 1.0 / jnp.maximum(p.transp_ior, 1e-4))
    cos_i_o = jnp.clip(dot3(hh, wo), 0.0, 1.0)
    F = fresnel_dielectric(cos_i_o, eta_pair)
    thin = p.thin_walled > 0
    # refraction direction (Snell, against hh)
    inv_eta = 1.0 / jnp.maximum(eta_pair, 1e-6)
    cos_t2 = 1.0 - inv_eta * inv_eta * (1.0 - cos_i_o * cos_i_o)
    tir = cos_t2 < 0.0
    cos_t = jnp.sqrt(jnp.clip(cos_t2, 0.0, 1.0))
    wt = normalize3(
        (-inv_eta)[..., None] * wo + (inv_eta * cos_i_o - cos_t)[..., None] * hh
    )
    refl_choice = (u3 < F) | tir
    wi_t = jnp.where(refl_choice[..., None], reflect3(-wo, hh),
                     jnp.where(thin[..., None], -wo, wt))
    # thin glass: passes straight through (ref ThinGlass class)

    # --- translucency: cosine hemisphere on the BACK side
    wi_l = -wi_d

    # --- combine
    wi = jnp.where(pick_d[..., None], wi_d, jnp.where(pick_s[..., None], wi_s,
                   jnp.where(pick_t[..., None], wi_t, wi_l)))

    spec = (pick_s & is_mirror) | (pick_t & ~rough_glass)
    is_transmission = (pick_t & ~refl_choice) | pick_l

    # weights
    f_mix, pdf_mix = eval_bsdf(p, wo, wi, ns, feats)
    cos_i = jnp.abs(dot3(ns, wi))
    w_glossy = f_mix * (cos_i / jnp.maximum(pdf_mix, EPS_PDF))[..., None]

    w_mirror = p.refl_color / jnp.maximum(ks, EPS_PDF)[..., None]
    fres_m = jnp.where(
        p.fresnel_on > 0.5,
        fresnel_dielectric(cos_i_o, jnp.maximum(p.fresnel_ior, 1.0 + 1e-4)),
        1.0,
    )
    w_mirror = w_mirror * fres_m[..., None]
    w_glass = p.transp_color / jnp.maximum(kt, EPS_PDF)[..., None]
    # (glass reflect/refract choice already ∝ F — weight stays tint/kt)

    weight = jnp.where(
        spec[..., None],
        jnp.where(pick_t[..., None], w_glass, w_mirror),
        w_glossy,
    )
    pdf = jnp.where(spec, 0.0, pdf_mix)
    dead = ~(pick_d | pick_s | pick_t | pick_l)
    weight = jnp.where(dead[..., None] | ~alive[..., None], 0.0, weight)

    return BsdfSample(wi=wi, weight=weight, pdf=pdf, is_specular=spec,
                      is_transmission=is_transmission, is_diff_trans=pick_l)
