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


def select_light(lights, u):
    """CDF pick: returns (index (R,), pick_prob (R,))."""
    cdf = lights.pick_cdf
    idx = jnp.clip(jnp.searchsorted(cdf, u, side="right") - 1, 0, cdf.shape[0] - 2)
    prob = cdf[idx + 1] - cdf[idx]
    return idx.astype(jnp.int32), jnp.maximum(prob, 1e-12)


def env_radiance(scene, d):
    """Sky radiance along direction d (R,3): constant color x optional
    lat-long texture (ref: environmentColorExtended, material.cl:344)."""
    lt = scene.lights
    sky_rows = jnp.asarray(lt.ltype) == LIGHT_SKY
    has_sky = sky_rows.any()
    sky_row = jnp.argmax(sky_rows)
    tex = lt.tex[sky_row]
    u = 0.5 + jnp.arctan2(d[:, 0], -d[:, 2]) * (0.5 / np.pi)
    v = jnp.arccos(jnp.clip(d[:, 1], -1.0, 1.0)) * (1.0 / np.pi)
    texc = sample_bilinear(scene.texels, scene.tex_table, jnp.broadcast_to(tex, (d.shape[0],)), jnp.stack([u, v], -1), scene.tex_sampler)[:, :3]
    base = jnp.where(has_sky, lt.intensity[sky_row], scene.env_color)
    return base[None, :] * jnp.where(has_sky & (tex > 0), texc, jnp.ones_like(texc))


def sample_light_rev(scene, l_idx, rnds, sp) -> LightSample:
    """Sample one point/direction on light l_idx (R,) from surface points sp
    (R,3) with rnds (R,3) uniforms."""
    lt = scene.lights
    ltype = lt.ltype[l_idx]
    pos = lt.pos[l_idx]
    nrm = lt.norm[l_idx]
    vx = lt.vx[l_idx]
    vy = lt.vy[l_idx]
    inten = lt.intensity[l_idx]
    radius = lt.radius[l_idx]
    area = jnp.maximum(lt.area[l_idx], 1e-12)
    cos_in = lt.cos_in[l_idx]
    cos_out = lt.cos_out[l_idx]

    u1, u2 = rnds[:, 0], rnds[:, 1]

    # --- area rect / disk sample point
    p_rect = pos + (2.0 * u1 - 1.0)[:, None] * vx + (2.0 * u2 - 1.0)[:, None] * vy
    r_d = jnp.sqrt(jnp.clip(u1, 0.0, 1.0))
    phi_d = 2.0 * np.pi * u2
    p_disk = pos + (r_d * jnp.cos(phi_d))[:, None] * vx + (r_d * jnp.sin(phi_d))[:, None] * vy

    is_rect = ltype == LIGHT_AREA_RECT
    is_disk = ltype == LIGHT_AREA_DISK
    is_area = is_rect | is_disk
    p_area = jnp.where(is_rect[:, None], p_rect, p_disk)

    to_l = p_area - sp
    d2 = jnp.maximum(dot3(to_l, to_l), 1e-12)
    dist_a = jnp.sqrt(d2)
    dir_a = to_l / dist_a[:, None]
    cos_l = dot3(nrm, -dir_a)
    pdf_a = d2 / (area * jnp.maximum(cos_l, 1e-6))
    rad_a = jnp.where((cos_l > 1e-6)[:, None], inten, 0.0)

    # --- sphere: uniform over sphere surface facing the point (cone sampling)
    to_c = pos - sp
    dc2 = jnp.maximum(dot3(to_c, to_c), 1e-12)
    dc = jnp.sqrt(dc2)
    sin_max2 = jnp.clip(radius * radius / dc2, 0.0, 0.9999)
    cos_max = jnp.sqrt(1.0 - sin_max2)
    cos_t = 1.0 - u1 * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.clip(1.0 - cos_t * cos_t, 0.0, 1.0))
    phi = 2.0 * np.pi * u2
    wdir = normalize3(to_c)
    tb, bb = make_orthonormal_basis(wdir)
    dir_s = normalize3(
        (sin_t * jnp.cos(phi))[:, None] * tb + (sin_t * jnp.sin(phi))[:, None] * bb + cos_t[:, None] * wdir
    )
    pdf_s = 1.0 / jnp.maximum(2.0 * np.pi * (1.0 - cos_max), 1e-9)
    # distance to sphere along dir_s
    b_ = dot3(dir_s, to_c)
    disc = jnp.maximum(b_ * b_ - dc2 + radius * radius, 0.0)
    dist_s = b_ - jnp.sqrt(disc)

    # --- point / spot: delta
    dir_p = normalize3(to_c)
    inv_d2 = 1.0 / dc2
    spot_cos = dot3(nrm, -dir_p)  # angle from spot axis
    spot_fall = _smoothstep01(
        (spot_cos - cos_out) / jnp.maximum(cos_in - cos_out, 1e-6))
    rad_p = inten * inv_d2[:, None]
    # IES photometric profile: spherical lookup of the emitted direction
    # around the light axis (ref: IES sphere sampling, clight.h:411)
    tex_slot = lt.tex[l_idx]
    emit_dir = -dir_p  # light -> surface
    cos_ax = jnp.clip(dot3(emit_dir, nrm), -1.0, 1.0)
    theta_v = jnp.arccos(cos_ax) * (1.0 / np.pi)
    tb2, bb2 = make_orthonormal_basis(nrm)
    phi_v = (jnp.arctan2(dot3(emit_dir, bb2), dot3(emit_dir, tb2)) * (0.5 / np.pi)) % 1.0
    ies_val = sample_bilinear(
        scene.texels, scene.tex_table, tex_slot,
        jnp.stack([phi_v, theta_v], -1), scene.tex_sampler
    )[:, 0]
    has_ies = (tex_slot > 0) & ((ltype == LIGHT_POINT) | (ltype == LIGHT_SPOT))
    rad_p = rad_p * jnp.where(has_ies, ies_val, 1.0)[:, None]
    rad_spot = rad_p * spot_fall[:, None]

    # --- direct (sun): delta direction
    dir_dir = -nrm
    rad_dir = inten

    # --- sky: importance-sampled from the env pdf tables (Map2DPiecewise-
    # Sample semantics, clight.h:369; trivial table ~ sin-weighted uniform)
    from hydracore_tpu.lights.envmap import sample_env_dir

    dir_sky, pdf_sky = sample_env_dir(
        scene.env_rows_cdf, scene.env_cols_cdf, scene.env_pdf_uv, u1, u2
    )
    rad_sky = env_radiance(scene, dir_sky)

    # --- mesh light: pick a triangle by area CDF, then a uniform point
    # (ref MeshLight + CalcTrianglePickProbTable, PlainLightConverter.cpp:724)
    mrow = jnp.clip(lt.mesh_row[l_idx], 0, scene.ml_cdf.shape[0] - 1)
    cdf_rows = scene.ml_cdf[mrow]  # (R, TMAX)
    ti = jnp.sum((cdf_rows < u1[:, None]).astype(jnp.int32), axis=1)
    ti = jnp.clip(ti, 0, scene.ml_tri.shape[1] - 1)
    tri = jnp.clip(scene.ml_tri[mrow, ti], 0, scene.tri_v0.shape[0] - 1)
    u3m = rnds[:, 2]
    r1 = jnp.sqrt(jnp.clip(u2, 0.0, 1.0))
    b1 = r1 * (1.0 - u3m)
    b2 = r1 * u3m
    p_mesh = (scene.tri_v0[tri] + b1[:, None] * scene.tri_e1[tri]
              + b2[:, None] * scene.tri_e2[tri])
    n_mesh = normalize3(cross3(scene.tri_e1[tri], scene.tri_e2[tri]))
    to_m = p_mesh - sp
    dm2 = jnp.maximum(dot3(to_m, to_m), 1e-12)
    dist_m = jnp.sqrt(dm2)
    dir_m = to_m / dist_m[:, None]
    cos_m = jnp.abs(dot3(n_mesh, -dir_m))  # two-sided emission
    pdf_m = dm2 / (area * jnp.maximum(cos_m, 1e-6))
    rad_m = jnp.where((cos_m > 1e-6)[:, None], inten, 0.0)

    # --- cylinder: sample a point on the lateral surface (area sampling)
    axis = normalize3(vx)
    half_h = jnp.sqrt(jnp.maximum(dot3(vx, vx), 1e-12))
    at, ab = make_orthonormal_basis(axis)
    phi_c = 2.0 * np.pi * u2
    radial = jnp.cos(phi_c)[:, None] * at + jnp.sin(phi_c)[:, None] * ab
    p_cyl = pos + ((2.0 * u1 - 1.0) * half_h)[:, None] * axis + radius[:, None] * radial
    to_c2 = p_cyl - sp
    dc2b = jnp.maximum(dot3(to_c2, to_c2), 1e-12)
    dist_c = jnp.sqrt(dc2b)
    dir_c = to_c2 / dist_c[:, None]
    cos_c = dot3(radial, -dir_c)
    pdf_c = dc2b / (area * jnp.maximum(cos_c, 1e-6))
    rad_c = jnp.where((cos_c > 1e-6)[:, None], inten, 0.0)

    # combine by type
    def sel3(cond, a, b):
        return jnp.where(cond[:, None], a, b)

    direction = sel3(is_area, dir_a, dir_p)
    direction = sel3(ltype == LIGHT_MESH, dir_m, direction)
    direction = sel3(ltype == LIGHT_SPHERE, dir_s, direction)
    direction = sel3(ltype == LIGHT_CYLINDER, dir_c, direction)
    direction = sel3(ltype == LIGHT_DIRECT, dir_dir, direction)
    direction = sel3(ltype == LIGHT_SKY, dir_sky, direction)

    dist = jnp.where(is_area, dist_a, dc)
    dist = jnp.where(ltype == LIGHT_MESH, dist_m, dist)
    dist = jnp.where(ltype == LIGHT_SPHERE, dist_s, dist)
    dist = jnp.where(ltype == LIGHT_CYLINDER, dist_c, dist)
    dist = jnp.where((ltype == LIGHT_DIRECT) | (ltype == LIGHT_SKY), FAR_DIST, dist)

    # sky portals re-emit the environment seen through the opening
    # (SkyPortal, PlainLightConverter.cpp:304)
    portal = (lt.is_portal[l_idx] > 0)
    rad_a = jnp.where(portal[:, None], rad_a * env_radiance(scene, dir_a), rad_a)

    radiance = sel3(is_area, rad_a, rad_p)
    radiance = sel3(ltype == LIGHT_MESH, rad_m, radiance)
    radiance = sel3(ltype == LIGHT_SPOT, rad_spot, radiance)
    radiance = sel3(ltype == LIGHT_SPHERE, inten, radiance)
    radiance = sel3(ltype == LIGHT_CYLINDER, rad_c, radiance)
    radiance = sel3(ltype == LIGHT_DIRECT, rad_dir, radiance)
    radiance = sel3(ltype == LIGHT_SKY, rad_sky, radiance)

    pdf_w = jnp.where(is_area, pdf_a, 1.0)
    pdf_w = jnp.where(ltype == LIGHT_MESH, pdf_m, pdf_w)
    pdf_w = jnp.where(ltype == LIGHT_SPHERE, pdf_s, pdf_w)
    pdf_w = jnp.where(ltype == LIGHT_CYLINDER, pdf_c, pdf_w)
    pdf_w = jnp.where(ltype == LIGHT_SKY, pdf_sky, pdf_w)

    is_delta = (ltype == LIGHT_POINT) | (ltype == LIGHT_SPOT) | (ltype == LIGHT_DIRECT)
    cos_at_light = jnp.where(is_area, cos_l, 1.0)
    cos_at_light = jnp.where(ltype == LIGHT_MESH, cos_m, cos_at_light)
    cos_at_light = jnp.where(ltype == LIGHT_CYLINDER, cos_c, cos_at_light)

    return LightSample(
        dir=direction, dist=dist, radiance=radiance, pdf_w=pdf_w,
        is_delta=is_delta, cos_at_light=cos_at_light,
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
    lt = scene.lights
    ltype = lt.ltype[l_idx]
    pos_c = lt.pos[l_idx]
    nrm = lt.norm[l_idx]
    vx = lt.vx[l_idx]
    vy = lt.vy[l_idx]
    inten = lt.intensity[l_idx]
    radius = lt.radius[l_idx]
    area = jnp.maximum(lt.area[l_idx], 1e-12)
    cos_in = lt.cos_in[l_idx]
    cos_out = lt.cos_out[l_idx]

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
    mrow = jnp.clip(lt.mesh_row[l_idx], 0, scene.ml_cdf.shape[0] - 1)
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
    tex_slot = lt.tex[l_idx]
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


def light_eval_pdf_from_hit(scene, l_idx, ray_o, ray_d, hit_pos, hit_norm):
    """Solid-angle pdf of sample_light_rev having produced direction ray_d
    toward the light surface point hit_pos (used for MIS when a BSDF ray
    lands on an emitter — ref lightEvalPDF clight.h:1613)."""
    lt = scene.lights
    ltype = lt.ltype[l_idx]
    pos = lt.pos[l_idx]
    radius = lt.radius[l_idx]
    area = jnp.maximum(lt.area[l_idx], 1e-12)

    to_h = hit_pos - ray_o
    d2 = jnp.maximum(dot3(to_h, to_h), 1e-12)
    cos_l = jnp.maximum(dot3(hit_norm, -ray_d), 1e-6)
    pdf_area_lights = d2 / (area * cos_l)

    to_c = pos - ray_o
    dc2 = jnp.maximum(dot3(to_c, to_c), 1e-12)
    sin_max2 = jnp.clip(radius * radius / dc2, 0.0, 0.9999)
    cos_max = jnp.sqrt(1.0 - sin_max2)
    pdf_sphere = 1.0 / jnp.maximum(2.0 * np.pi * (1.0 - cos_max), 1e-9)

    pdf = jnp.where(ltype == LIGHT_SPHERE, pdf_sphere, pdf_area_lights)
    from hydracore_tpu.lights.envmap import env_pdf_for_dir

    pdf_env = env_pdf_for_dir(scene.env_rows_cdf, scene.env_cols_cdf,
                              scene.env_pdf_uv, ray_d)
    pdf = jnp.where(ltype == LIGHT_SKY, pdf_env, pdf)
    return pdf


def sky_pdf():
    return INV_4PI
