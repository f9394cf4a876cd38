"""Light sampling (NEE) + pdf evaluation for MIS — vectorized.

TPU-native analogue of hydra_drv/clight.h: LightSampleRev:1561 (one sample
toward a picked light from a surface point), lightEvalPDF:1613 (pdf of a
BSDF ray having hit that light, for MIS), SelectRandomLightRev CDF walk
(RenderDriverRTE light pick table, SURVEY.md §2.1 'Light compiler').

All per-type math is computed branch-free and combined with masked selects
over the type enum — one gather of the light record per ray.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from hydracore_tpu.ops.texture import sample_bilinear
from hydracore_tpu.scene.lights import (
    LIGHT_MESH,
    LIGHT_AREA_DISK,
    LIGHT_AREA_RECT,
    LIGHT_CYLINDER,
    LIGHT_DIRECT,
    LIGHT_POINT,
    LIGHT_SKY,
    LIGHT_SPHERE,
    LIGHT_SPOT,
)
from hydracore_tpu.utils.math3d import cross3, dot3, make_orthonormal_basis, normalize3

FAR_DIST = 1e8
INV_4PI = float(1.0 / (4.0 * np.pi))


def _smoothstep01(x):
    """Hermite falloff used by the reference for spot penumbrae
    (mylocalsmoothstep, clight.h:7, applied at :538/:880)."""
    x = jnp.clip(x, 0.0, 1.0)
    return x * x * (3.0 - 2.0 * x)


class LightSample(NamedTuple):
    dir: jnp.ndarray  # (R,3) surface -> light
    dist: jnp.ndarray  # (R,)
    radiance: jnp.ndarray  # (R,3) incident radiance along dir (pre-divided for point)
    pdf_w: jnp.ndarray  # (R,) solid-angle pdf (1 for delta lights)
    is_delta: jnp.ndarray  # (R,) bool — MIS weight 1
    cos_at_light: jnp.ndarray  # (R,)
    pick_prob: jnp.ndarray = None  # (R,) pick probability of this light


def _light_rows(scene, l_idx):
    """Packed light_attr row fetch. Single-light scenes (the common case)
    broadcast row 0 statically — XLA gathers cost ~1.6 ms per OP on this
    TPU regardless of width (tools/exp_gather.py), and a uniform-index
    gather still pays it."""
    from hydracore_tpu.ops.gather import gather_rows

    la = scene.light_attr
    if la.shape[0] == 1:
        return jnp.broadcast_to(la[0], (l_idx.shape[0], la.shape[1]))
    return gather_rows(la, l_idx)


def select_light(lights, u):
    """CDF pick: returns (index (R,), pick_prob (R,)). Broadcast compare-sum
    instead of searchsorted: elementwise on TPU, no per-ray gather."""
    cdf = lights.pick_cdf
    idx = jnp.clip(jnp.sum(cdf[None, 1:-1] <= u[:, None], axis=1),
                   0, cdf.shape[0] - 2)
    prob = cdf[idx + 1] - cdf[idx]
    return idx.astype(jnp.int32), jnp.maximum(prob, 1e-12)


def _light_types(scene) -> set:
    st = scene.settings
    if st is None:
        return set(range(9))
    return set(getattr(st, "light_types", tuple(range(9))))


def env_radiance(scene, d):
    """Sky radiance along direction d (R,3): constant color x optional
    lat-long texture (ref: environmentColorExtended, material.cl:344).
    Statically skipped (constant env_color) for scenes without a sky light."""
    lt = scene.lights
    if LIGHT_SKY not in _light_types(scene):
        return jnp.broadcast_to(scene.env_color, d.shape)
    from hydracore_tpu.ops.texture import tex_fetch

    sky_rows = jnp.asarray(lt.ltype) == LIGHT_SKY
    has_sky = sky_rows.any()
    sky_row = jnp.argmax(sky_rows)
    tex = lt.tex[sky_row]
    u = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) * (0.5 / np.pi)
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) * (1.0 / np.pi)
    texc = tex_fetch(scene, jnp.broadcast_to(tex, (d.shape[0],)),
                     jnp.stack([u, v], -1))[:, :3]
    base = jnp.where(has_sky, lt.intensity[sky_row], scene.env_color)
    return base[None, :] * jnp.where(has_sky & (tex > 0), texc, jnp.ones_like(texc))


def env_back_radiance(scene, d):
    """Second-env back plate color along direction d (R,3): spherical
    lat-long lookup or camera-projected screen-space lookup of the sky
    light's <back> texture (ref backColorOfSecondEnv, cbidir.h:543-572).
    Only call under settings.has_env_back — replaces env radiance for
    camera-visible rays (environmentColorExtended, cbidir.h:624)."""
    from hydracore_tpu.ops.texture import tex_fetch

    eb = scene.env_back
    slot = eb[0].astype(jnp.int32)
    spherical = eb[1] < 1.5
    mult = eb[3:6]

    # spherical: same lat-long mapping as the primary env
    u_s = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) * (0.5 / np.pi)
    v_s = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) * (1.0 / np.pi)

    # camera-projected: project the ray direction through the camera
    # (screen uv of the pixel the ray left from — exact for pinhole
    # primaries, the reference uses the packed pixel id)
    cam = scene.camera
    w2v = jnp.linalg.inv(cam.mWorldViewInv)
    proj = jnp.linalg.inv(cam.mProjInv)
    dv = d @ w2v[:3, :3].T
    # homogeneous point at infinity [dv, 0]: the direction's vanishing
    # point — exact screen uv for pinhole primaries
    pv = jnp.concatenate([dv, jnp.zeros((d.shape[0], 1), jnp.float32)], -1) \
        @ proj.T
    ndc = pv[:, :2] / jnp.maximum(jnp.abs(pv[:, 3:4]), 1e-12)
    u_c = jnp.clip(ndc[:, 0] * 0.5 + 0.5, 0.0, 1.0)
    v_c = jnp.clip(0.5 - ndc[:, 1] * 0.5, 0.0, 1.0)

    uv = jnp.where(spherical,
                   jnp.stack([u_s, v_s], -1), jnp.stack([u_c, v_c], -1))
    texc = tex_fetch(scene, jnp.broadcast_to(slot, (d.shape[0],)),
                     uv)[:, :3]
    return mult[None, :] * texc


def sample_light_rev(scene, l_idx, rnds, sp, rows=None) -> LightSample:
    """Sample one point/direction on light l_idx (R,) from surface points sp
    (R,3) with rnds (R,3) uniforms.

    Gather-optimal: ONE packed light-row gather (scene.light_attr) and each
    per-type branch statically dropped when the scene has no light of that
    type (settings.light_types, the compile-gate pattern of
    GPUOCLKernels.cpp:424-512 kernel-variant selection). `rows` supplies
    prefetched light_attr rows (pt.py fuses this gather with the
    implicit-hit eval's into one 2R-index gather per bounce)."""
    from hydracore_tpu.scene.lights import (LA_AREA, LA_COS_IN, LA_COS_OUT,
                                            LA_INTEN, LA_MESH_ROW, LA_NORM,
                                            LA_PICK_PROB, LA_PORTAL, LA_POS,
                                            LA_RADIUS, LA_TEX, LA_TYPE,
                                            LA_VX, LA_VY)

    types = _light_types(scene)
    a = _light_rows(scene, l_idx) if rows is None else rows
    ltype = a[:, LA_TYPE].astype(jnp.int32)
    pos = a[:, LA_POS:LA_POS + 3]
    nrm = a[:, LA_NORM:LA_NORM + 3]
    vx = a[:, LA_VX:LA_VX + 3]
    vy = a[:, LA_VY:LA_VY + 3]
    inten = a[:, LA_INTEN:LA_INTEN + 3]
    radius = a[:, LA_RADIUS]
    area = jnp.maximum(a[:, LA_AREA], 1e-12)
    cos_in = a[:, LA_COS_IN]
    cos_out = a[:, LA_COS_OUT]
    pick_prob = a[:, LA_PICK_PROB]

    u1, u2 = rnds[:, 0], rnds[:, 1]

    def sel3(cond, x, y):
        return jnp.where(cond[:, None], x, y)

    # shared geometry to the light center
    to_c = pos - sp
    dc2 = jnp.maximum(dot3(to_c, to_c), 1e-12)
    dc = jnp.sqrt(dc2)
    dir_p = to_c / dc[:, None]

    # defaults (point-light-ish); per-type branches overwrite below
    direction = dir_p
    dist = dc
    radiance = inten / dc2[:, None]
    pdf_w = jnp.ones_like(dc)
    cos_at_light = jnp.ones_like(dc)

    # --- IES photometric profile on point/spot (clight.h:411)
    if (LIGHT_POINT in types or LIGHT_SPOT in types) and \
            (scene.settings is None or getattr(scene.settings, "has_ies", True)):
        from hydracore_tpu.ops.texture import tex_fetch

        tex_slot = a[:, LA_TEX].astype(jnp.int32)
        emit_dir = -dir_p
        cos_ax = jnp.clip(dot3(emit_dir, nrm), -1.0, 1.0)
        theta_v = jnp.arccos(cos_ax) * (1.0 / np.pi)
        tb2, bb2 = make_orthonormal_basis(nrm)
        phi_v = (jnp.arctan2(dot3(emit_dir, bb2), dot3(emit_dir, tb2)) * (0.5 / np.pi)) % 1.0
        ies_val = tex_fetch(scene, tex_slot,
                            jnp.stack([phi_v, theta_v], -1))[:, 0]
        has_ies = (tex_slot > 0) & ((ltype == LIGHT_POINT) | (ltype == LIGHT_SPOT))
        radiance = radiance * jnp.where(has_ies, ies_val, 1.0)[:, None]

    # --- spot falloff
    if LIGHT_SPOT in types:
        spot_cos = dot3(nrm, -dir_p)
        spot_fall = _smoothstep01(
            (spot_cos - cos_out) / jnp.maximum(cos_in - cos_out, 1e-6))
        radiance = radiance * jnp.where(ltype == LIGHT_SPOT, spot_fall, 1.0)[:, None]

    # --- area rect / disk
    if LIGHT_AREA_RECT in types or LIGHT_AREA_DISK in types:
        p_rect = pos + (2.0 * u1 - 1.0)[:, None] * vx + (2.0 * u2 - 1.0)[:, None] * vy
        r_d = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
        phi_d = 2.0 * np.pi * u2
        p_disk = pos + (r_d * jnp.cos(phi_d))[:, None] * vx \
            + (r_d * jnp.sin(phi_d))[:, None] * vy
        is_rect = ltype == LIGHT_AREA_RECT
        is_area = is_rect | (ltype == LIGHT_AREA_DISK)
        p_area = jnp.where(is_rect[:, None], p_rect, p_disk)
        to_l = p_area - sp
        d2 = jnp.maximum(dot3(to_l, to_l), 1e-12)
        dist_a = jnp.sqrt(d2)
        dir_a = to_l / dist_a[:, None]
        cos_l = dot3(nrm, -dir_a)
        pdf_a = d2 / (area * jnp.maximum(cos_l, 1e-6))
        rad_a = jnp.where((cos_l > 1e-6)[:, None], inten, 0.0)
        # sky portals re-emit the environment through the opening
        # (SkyPortal, PlainLightConverter.cpp:304)
        if scene.settings is None or getattr(scene.settings, "has_portal", True):
            portal = a[:, LA_PORTAL] > 0
            rad_a = jnp.where(portal[:, None],
                              rad_a * env_radiance(scene, dir_a), rad_a)
        direction = sel3(is_area, dir_a, direction)
        dist = jnp.where(is_area, dist_a, dist)
        radiance = sel3(is_area, rad_a, radiance)
        pdf_w = jnp.where(is_area, pdf_a, pdf_w)
        cos_at_light = jnp.where(is_area, cos_l, cos_at_light)

    # --- sphere: cone sampling toward the visible cap
    if LIGHT_SPHERE in types:
        sin_max2 = jnp.clip(radius * radius / dc2, 0.0, 0.9999)
        cos_max = jnp.sqrt(1.0 - sin_max2)
        cos_t = 1.0 - u1 * (1.0 - cos_max)
        sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
        phi = 2.0 * np.pi * u2
        tb, bb = make_orthonormal_basis(dir_p)
        dir_s = normalize3((sin_t * jnp.cos(phi))[:, None] * tb
                           + (sin_t * jnp.sin(phi))[:, None] * bb
                           + cos_t[:, None] * dir_p)
        pdf_s = 1.0 / jnp.maximum(2.0 * np.pi * (1.0 - cos_max), 1e-9)
        b_ = dot3(dir_s, to_c)
        disc = jnp.maximum(b_ * b_ - dc2 + radius * radius, 0.0)
        dist_s = b_ - jnp.sqrt(disc)
        is_sph = ltype == LIGHT_SPHERE
        direction = sel3(is_sph, dir_s, direction)
        dist = jnp.where(is_sph, dist_s, dist)
        radiance = sel3(is_sph, inten, radiance)
        pdf_w = jnp.where(is_sph, pdf_s, pdf_w)

    # --- direct (sun): delta direction
    if LIGHT_DIRECT in types:
        is_dir = ltype == LIGHT_DIRECT
        direction = sel3(is_dir, -nrm, direction)
        dist = jnp.where(is_dir, FAR_DIST, dist)
        radiance = sel3(is_dir, inten, radiance)
        pdf_w = jnp.where(is_dir, 1.0, pdf_w)

    # --- sky: env-importance sample (Map2DPiecewiseSample, clight.h:369)
    if LIGHT_SKY in types:
        from hydracore_tpu.lights.envmap import sample_env_dir

        dir_sky, pdf_sky = sample_env_dir(
            scene.env_rows_cdf, scene.env_cols_cdf, scene.env_pdf_uv, u1, u2)
        rad_sky = env_radiance(scene, dir_sky)
        is_sky = ltype == LIGHT_SKY
        direction = sel3(is_sky, dir_sky, direction)
        dist = jnp.where(is_sky, FAR_DIST, dist)
        radiance = sel3(is_sky, rad_sky, radiance)
        pdf_w = jnp.where(is_sky, pdf_sky, pdf_w)

    # --- mesh light: triangle by area CDF + uniform point
    # (MeshLight + CalcTrianglePickProbTable, PlainLightConverter.cpp:724)
    if LIGHT_MESH in types:
        mrow = jnp.clip(a[:, LA_MESH_ROW].astype(jnp.int32), 0,
                        scene.ml_cdf.shape[0] - 1)
        cdf_rows = scene.ml_cdf[mrow]
        ti = jnp.sum((cdf_rows < u1[:, None]).astype(jnp.int32), axis=1)
        ti = jnp.clip(ti, 0, scene.ml_tri.shape[1] - 1)
        tri = jnp.clip(scene.ml_tri[mrow, ti], 0, scene.tri_v0.shape[0] - 1)
        u3m = rnds[:, 2]
        r1 = jnp.sqrt(jnp.clip(u2, 0.0, 1.0))
        b1 = r1 * (1.0 - u3m)
        b2 = r1 * u3m
        ta = scene.tri_attr[tri]
        tv0, te1, te2 = ta[:, 0:3], ta[:, 3:6], ta[:, 6:9]
        p_mesh = tv0 + b1[:, None] * te1 + b2[:, None] * te2
        n_mesh = normalize3(cross3(te1, te2))
        to_m = p_mesh - sp
        dm2 = jnp.maximum(dot3(to_m, to_m), 1e-12)
        dist_m = jnp.sqrt(dm2)
        dir_m = to_m / dist_m[:, None]
        cos_m = jnp.abs(dot3(n_mesh, -dir_m))  # two-sided emission
        pdf_m = dm2 / (area * jnp.maximum(cos_m, 1e-6))
        rad_m = jnp.where((cos_m > 1e-6)[:, None], inten, 0.0)
        is_mesh = ltype == LIGHT_MESH
        direction = sel3(is_mesh, dir_m, direction)
        dist = jnp.where(is_mesh, dist_m, dist)
        radiance = sel3(is_mesh, rad_m, radiance)
        pdf_w = jnp.where(is_mesh, pdf_m, pdf_w)
        cos_at_light = jnp.where(is_mesh, cos_m, cos_at_light)

    # --- cylinder: lateral-surface area sampling
    if LIGHT_CYLINDER in types:
        axis = normalize3(vx)
        half_h = jnp.sqrt(jnp.maximum(dot3(vx, vx), 1e-12))
        at, ab = make_orthonormal_basis(axis)
        phi_c = 2.0 * np.pi * u2
        radial = jnp.cos(phi_c)[:, None] * at + jnp.sin(phi_c)[:, None] * ab
        p_cyl = pos + ((2.0 * u1 - 1.0) * half_h)[:, None] * axis \
            + radius[:, None] * radial
        to_c2 = p_cyl - sp
        dc2b = jnp.maximum(dot3(to_c2, to_c2), 1e-12)
        dist_c = jnp.sqrt(dc2b)
        dir_c = to_c2 / dist_c[:, None]
        cos_c = dot3(radial, -dir_c)
        pdf_c = dc2b / (area * jnp.maximum(cos_c, 1e-6))
        rad_c = jnp.where((cos_c > 1e-6)[:, None], inten, 0.0)
        is_cyl = ltype == LIGHT_CYLINDER
        direction = sel3(is_cyl, dir_c, direction)
        dist = jnp.where(is_cyl, dist_c, dist)
        radiance = sel3(is_cyl, rad_c, radiance)
        pdf_w = jnp.where(is_cyl, pdf_c, pdf_w)
        cos_at_light = jnp.where(is_cyl, cos_c, cos_at_light)

    is_delta = (ltype == LIGHT_POINT) | (ltype == LIGHT_SPOT) | (ltype == LIGHT_DIRECT)

    return LightSample(
        dir=direction, dist=dist, radiance=radiance, pdf_w=pdf_w,
        is_delta=is_delta, cos_at_light=cos_at_light, pick_prob=pick_prob,
    )


class LightSampleFwd(NamedTuple):
    pos: jnp.ndarray  # (R,3) point on light
    dir: jnp.ndarray  # (R,3) emitted direction
    norm: jnp.ndarray  # (R,3) light normal at pos
    radiance: jnp.ndarray  # (R,3) emitted radiance
    pdf_a: jnp.ndarray  # (R,) area pdf of pos
    pdf_w: jnp.ndarray  # (R,) solid-angle pdf of dir (cos-weighted)
    cos_at_light: jnp.ndarray  # (R,)


def scene_bounding_sphere(scene):
    """(center (3,), radius) of the scene, from the BVH root box."""
    c = (scene.bvh_bmin[0] + scene.bvh_bmax[0]) * 0.5
    r = jnp.linalg.norm(scene.bvh_bmax[0] - scene.bvh_bmin[0]) * 0.5 + 1e-3
    return c, r


def sample_light_fwd(scene, l_idx, rnds) -> LightSampleFwd:
    """Sample an emission ray (LT/SBDPT path start) — ref LightSampleForward
    (clight.h:1064), all light types: area rect/disk, sphere, cylinder,
    point (+IES), spot (cone + smoothstep falloff + IES), direct(sun) and
    sky (env-importance direction from a scene-bounds disk)."""
    from hydracore_tpu.scene.lights import (LA_AREA, LA_COS_IN, LA_COS_OUT,
                                            LA_INTEN, LA_MESH_ROW, LA_NORM,
                                            LA_POS, LA_RADIUS, LA_TEX,
                                            LA_TYPE, LA_VX, LA_VY)

    a = _light_rows(scene, l_idx)  # ONE packed row gather for all fields
    ltype = a[:, LA_TYPE].astype(jnp.int32)
    pos_c = a[:, LA_POS:LA_POS + 3]
    nrm = a[:, LA_NORM:LA_NORM + 3]
    vx = a[:, LA_VX:LA_VX + 3]
    vy = a[:, LA_VY:LA_VY + 3]
    inten = a[:, LA_INTEN:LA_INTEN + 3]
    radius = a[:, LA_RADIUS]
    area = jnp.maximum(a[:, LA_AREA], 1e-12)
    cos_in = a[:, LA_COS_IN]
    cos_out = a[:, LA_COS_OUT]

    u1, u2, u3, u4 = rnds[:, 0], rnds[:, 1], rnds[:, 2], rnds[:, 3]

    # ---- position on the emitter
    p_rect = pos_c + (2 * u1 - 1)[:, None] * vx + (2 * u2 - 1)[:, None] * vy
    r_d = jnp.sqrt(jnp.clip(u1, 0, 1))
    phi_d = 2 * np.pi * u2
    p_disk = pos_c + (r_d * jnp.cos(phi_d))[:, None] * vx + (r_d * jnp.sin(phi_d))[:, None] * vy
    # sphere: uniform point on sphere
    z = 1.0 - 2.0 * u1
    r_ = jnp.sqrt(jnp.clip(1 - z * z, 0, 1))
    sph_n = jnp.stack([r_ * jnp.cos(2 * np.pi * u2), z, r_ * jnp.sin(2 * np.pi * u2)], -1)
    p_sph = pos_c + radius[:, None] * sph_n
    # cylinder: lateral surface, normal = radial
    axis = normalize3(vx)
    half_h = jnp.sqrt(jnp.maximum(dot3(vx, vx), 1e-12))
    at, ab = make_orthonormal_basis(axis)
    phi_c = 2 * np.pi * u2
    cyl_n = jnp.cos(phi_c)[:, None] * at + jnp.sin(phi_c)[:, None] * ab
    p_cyl = pos_c + ((2 * u1 - 1) * half_h)[:, None] * axis + radius[:, None] * cyl_n

    is_rect = ltype == LIGHT_AREA_RECT
    is_disk = ltype == LIGHT_AREA_DISK
    is_sph = ltype == LIGHT_SPHERE
    is_cyl = ltype == LIGHT_CYLINDER
    is_mesh = ltype == LIGHT_MESH
    is_point = ltype == LIGHT_POINT
    is_spot = ltype == LIGHT_SPOT
    is_dir = ltype == LIGHT_DIRECT
    is_sky = ltype == LIGHT_SKY
    is_area = is_rect | is_disk
    surf = is_area | is_sph | is_cyl | is_mesh  # cosine-emitting surfaces

    # mesh light: triangle by area CDF + uniform point (MeshLight fwd)
    mrow = jnp.clip(a[:, LA_MESH_ROW].astype(jnp.int32), 0,
                    scene.ml_cdf.shape[0] - 1)
    cdf_rows = scene.ml_cdf[mrow]
    ti = jnp.clip(jnp.sum((cdf_rows < u1[:, None]).astype(jnp.int32), axis=1),
                  0, scene.ml_tri.shape[1] - 1)
    trim = jnp.clip(scene.ml_tri[mrow, ti], 0, scene.tri_v0.shape[0] - 1)
    # uniform barycentric point: sub-bin bits of u1/u2 (below the CDF
    # quantization) serve as two fresh uniforms
    ub1 = (u1 * 4096.0) % 1.0
    ub2 = (u2 * 4096.0) % 1.0
    r1m = jnp.sqrt(jnp.clip(ub1, 0.0, 1.0))
    p_mesh = (scene.tri_v0[trim]
              + (r1m * (1.0 - ub2))[:, None] * scene.tri_e1[trim]
              + (r1m * ub2)[:, None] * scene.tri_e2[trim])
    mesh_n = normalize3(cross3(scene.tri_e1[trim], scene.tri_e2[trim]))

    pos = jnp.where(is_rect[:, None], p_rect, jnp.where(is_disk[:, None], p_disk, p_sph))
    pos = jnp.where(is_cyl[:, None], p_cyl, pos)
    pos = jnp.where(is_mesh[:, None], p_mesh, pos)
    pos = jnp.where(surf[:, None], pos, pos_c)
    n = jnp.where(is_sph[:, None], sph_n, jnp.broadcast_to(nrm, sph_n.shape))
    n = jnp.where(is_cyl[:, None], cyl_n, n)
    n = jnp.where(is_mesh[:, None], mesh_n, n)

    # ---- direction
    # cosine-weighted about n (surface emitters)
    t, b = make_orthonormal_basis(n)
    ct = jnp.sqrt(jnp.clip(u3, 0, 1))
    st = jnp.sqrt(jnp.clip(1 - u3, 0, 1))
    ph = 2 * np.pi * u4
    d_cos = (st * jnp.cos(ph))[:, None] * t + (st * jnp.sin(ph))[:, None] * b + ct[:, None] * n
    # uniform sphere (point)
    z2 = 1.0 - 2.0 * u3
    r2 = jnp.sqrt(jnp.clip(1 - z2 * z2, 0, 1))
    d_uni = jnp.stack([r2 * jnp.cos(2 * np.pi * u4), z2, r2 * jnp.sin(2 * np.pi * u4)], -1)
    # spot: uniform direction inside the outer cone about the axis (nrm)
    ct_sp = 1.0 - u3 * (1.0 - jnp.clip(cos_out, -1.0, 1.0))
    st_sp = jnp.sqrt(jnp.clip(1.0 - ct_sp * ct_sp, 0, 1))
    ta, ba = make_orthonormal_basis(jnp.broadcast_to(nrm, sph_n.shape))
    d_spot = (st_sp * jnp.cos(ph))[:, None] * ta + (st_sp * jnp.sin(ph))[:, None] * ba \
        + ct_sp[:, None] * nrm
    pdf_spot = 1.0 / jnp.maximum(2.0 * np.pi * (1.0 - cos_out), 1e-9)
    spot_fall = _smoothstep01(
        (ct_sp - cos_out) / jnp.maximum(cos_in - cos_out, 1e-6))

    direction = jnp.where(surf[:, None], d_cos, d_uni)
    direction = jnp.where(is_spot[:, None], d_spot, direction)

    # sky / sun: ray from a disk on the scene bounding sphere, inward
    from hydracore_tpu.lights.envmap import sample_env_dir

    sky_dir, pdf_sky = sample_env_dir(
        scene.env_rows_cdf, scene.env_cols_cdf, scene.env_pdf_uv, u3, u4)
    emit_far = jnp.where(is_sky[:, None], -sky_dir,
                         jnp.broadcast_to(nrm, sph_n.shape))  # sun emits along nrm
    cen, rad_s = scene_bounding_sphere(scene)
    td, bd = make_orthonormal_basis(emit_far)
    rr = jnp.sqrt(jnp.clip(u1, 0, 1)) * rad_s
    ph2 = 2 * np.pi * u2
    p_far = cen[None, :] - emit_far * (rad_s * 1.5) \
        + (rr * jnp.cos(ph2))[:, None] * td + (rr * jnp.sin(ph2))[:, None] * bd
    pdf_a_far = 1.0 / jnp.maximum(np.pi * rad_s * rad_s, 1e-12)

    far = is_sky | is_dir
    pos = jnp.where(far[:, None], p_far, pos)
    direction = jnp.where(far[:, None], emit_far, direction)
    n = jnp.where(far[:, None], emit_far, n)

    # ---- pdfs and radiance
    pdf_a = jnp.where(surf, 1.0 / area, 1.0)
    pdf_a = jnp.where(far, pdf_a_far, pdf_a)
    cos_l = jnp.where(surf, jnp.maximum(ct, 1e-6), 1.0)
    pdf_w = jnp.where(surf, cos_l * (1.0 / np.pi), INV_4PI)
    pdf_w = jnp.where(is_spot, pdf_spot, pdf_w)
    pdf_w = jnp.where(is_sky, jnp.maximum(pdf_sky, 1e-12), pdf_w)
    pdf_w = jnp.where(is_dir, 1.0, pdf_w)  # delta direction

    radiance = inten
    # IES photometric profile applied to the emitted direction for point /
    # spot (matches sample_light_rev so LT agrees with PT)
    tex_slot = a[:, LA_TEX].astype(jnp.int32)
    cos_ax = jnp.clip(dot3(direction, nrm), -1.0, 1.0)
    theta_v = jnp.arccos(cos_ax) * (1.0 / np.pi)
    phi_v = (jnp.arctan2(dot3(direction, ba), dot3(direction, ta)) * (0.5 / np.pi)) % 1.0
    ies_val = sample_bilinear(
        scene.texels, scene.tex_table, tex_slot,
        jnp.stack([phi_v, theta_v], -1), scene.tex_sampler
    )[:, 0]
    has_ies = (tex_slot > 0) & (is_point | is_spot)
    radiance = radiance * jnp.where(has_ies, ies_val, 1.0)[:, None]
    radiance = radiance * jnp.where(is_spot, spot_fall, 1.0)[:, None]
    radiance = jnp.where(is_sky[:, None], env_radiance(scene, sky_dir), radiance)

    return LightSampleFwd(pos=pos, dir=direction, norm=n, radiance=radiance,
                          pdf_a=pdf_a, pdf_w=pdf_w, cos_at_light=cos_l)


def light_eval_pdf_from_hit(scene, l_idx, ray_o, ray_d, hit_pos, hit_norm,
                            return_pick: bool = False, rows=None):
    """Solid-angle pdf of sample_light_rev having produced direction ray_d
    toward the light surface point hit_pos (used for MIS when a BSDF ray
    lands on an emitter — ref lightEvalPDF clight.h:1613). With
    return_pick, also returns the light's pick probability (free: same
    packed-row gather)."""
    from hydracore_tpu.scene.lights import (LA_AREA, LA_PICK_PROB, LA_POS,
                                            LA_RADIUS, LA_TYPE)

    types = _light_types(scene)
    a = _light_rows(scene, l_idx) if rows is None else rows
    ltype = a[:, LA_TYPE].astype(jnp.int32)
    area = jnp.maximum(a[:, LA_AREA], 1e-12)

    to_h = hit_pos - ray_o
    d2 = jnp.maximum(dot3(to_h, to_h), 1e-12)
    cos_l = jnp.maximum(dot3(hit_norm, -ray_d), 1e-6)
    pdf = d2 / (area * cos_l)

    if LIGHT_SPHERE in types:
        pos = a[:, LA_POS:LA_POS + 3]
        radius = a[:, LA_RADIUS]
        to_c = pos - ray_o
        dc2 = jnp.maximum(dot3(to_c, to_c), 1e-12)
        sin_max2 = jnp.clip(radius * radius / dc2, 0.0, 0.9999)
        cos_max = jnp.sqrt(1.0 - sin_max2)
        pdf_sphere = 1.0 / jnp.maximum(2.0 * np.pi * (1.0 - cos_max), 1e-9)
        pdf = jnp.where(ltype == LIGHT_SPHERE, pdf_sphere, pdf)

    if LIGHT_SKY in types:
        from hydracore_tpu.lights.envmap import env_pdf_for_dir

        pdf_env = env_pdf_for_dir(scene.env_rows_cdf, scene.env_cols_cdf,
                                  scene.env_pdf_uv, ray_d)
        pdf = jnp.where(ltype == LIGHT_SKY, pdf_env, pdf)
    if return_pick:
        return pdf, a[:, LA_PICK_PROB]
    return pdf


def sky_pdf():
    return INV_4PI
