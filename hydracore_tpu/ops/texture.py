"""Texture fetch from the packed heap (ops analogue of cfetch.h SWTexSampler
+ read_imagef: bilinear, no hardware samplers on TPU — gathers).

SWTexSampler fidelity (cfetch.h:108-131): the per-texture sampler row
carries the 2-row texcoord matrix and input gamma; tex_table flags carry
clamp/wrap addressing per axis.
"""
from __future__ import annotations

import jax.numpy as jnp

TEX_CLAMP_U = 1
TEX_CLAMP_V = 2


def sample_tex(texels, tex_meta, tex_id, uv, apply_gamma: bool = False):
    """Bilinear RGBA fetch from the packed (K, 12) tex_meta rows
    [bitcast_f32(off, w, h, flags) | m00 m01 tu m10 m11 tv gamma pad].

    Gather-optimal variant of sample_bilinear: ONE meta-row gather + ONE
    fused 4-corner texel gather (XLA gather cost is per-op on this TPU —
    tools/exp_gather.py)."""
    return sample_tex_row(texels, tex_meta[tex_id], uv, apply_gamma)


def sample_tex_row(texels, row, uv, apply_gamma: bool = False):
    """sample_tex with the (R, 12) meta rows already in hand — material rows
    carry their channels' meta baked in (scene.finalize_scene), dropping the
    per-bounce tex_meta gather entirely."""
    import jax
    meta_i = jax.lax.bitcast_convert_type(row[:, 0:4], jnp.int32)
    off, w, h, flags = meta_i[:, 0], meta_i[:, 1], meta_i[:, 2], meta_i[:, 3]
    wf, hf = w.astype(jnp.float32), h.astype(jnp.float32)

    u_in = row[:, 4] * uv[:, 0] + row[:, 5] * uv[:, 1] + row[:, 6]
    v_in = row[:, 7] * uv[:, 0] + row[:, 8] * uv[:, 1] + row[:, 9]
    gamma = row[:, 10]

    clamp_u = (flags & TEX_CLAMP_U) != 0
    clamp_v = (flags & TEX_CLAMP_V) != 0
    u = jnp.where(clamp_u, jnp.clip(u_in, 0.0, 1.0), u_in - jnp.floor(u_in))
    v = jnp.where(clamp_v, jnp.clip(v_in, 0.0, 1.0), v_in - jnp.floor(v_in))
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def wrap_x(xi):
        xi = xi.astype(jnp.int32)
        return jnp.where(clamp_u, jnp.clip(xi, 0, w - 1),
                         jnp.mod(xi, jnp.maximum(w, 1)))

    def wrap_y(yi):
        yi = yi.astype(jnp.int32)
        return jnp.where(clamp_v, jnp.clip(yi, 0, h - 1),
                         jnp.mod(yi, jnp.maximum(h, 1)))

    xa, xb = wrap_x(x0), wrap_x(x0 + 1)
    ya, yb = wrap_y(y0), wrap_y(y0 + 1)
    idx = jnp.concatenate([off + ya * w + xa, off + ya * w + xb,
                           off + yb * w + xa, off + yb * w + xb])
    c = texels[idx].reshape(4, -1, 4)
    top = c[0] * (1 - fx) + c[1] * fx
    bot = c[2] * (1 - fx) + c[3] * fx
    out = top * (1 - fy) + bot * fy
    if apply_gamma:
        rgb = jnp.where((gamma != 1.0)[:, None],
                        jnp.power(jnp.maximum(out[:, :3], 0.0), gamma[:, None]),
                        out[:, :3])
        out = jnp.concatenate([rgb, out[:, 3:4]], axis=1)
    return out


def tex_fetch_row(scene, row, uv, apply_gamma: bool = False):
    """Bilinear fetch given (R,12) meta rows, using the quad heap when the
    scene carries one (ONE (R,16) gather) and the 4-corner path otherwise."""
    if getattr(scene, "texels_quad", None) is not None:
        return sample_tex_row_quad(scene.texels_quad, row, uv, apply_gamma)
    return sample_tex_row(scene.texels, row, uv, apply_gamma)


def tex_fetch_rows_batch(scene, rows_list, uv, apply_gamma: bool = False):
    """K channel fetches at the SAME uv through ONE stacked heap gather.

    The per-channel fetches of a material (em/diff/refl/opacity/bump) each
    cost one serialized heap gather; stacking their (R,12) meta rows into a
    (K*R,12) batch turns K gather ops into one (K*R)-row op. Bit-identical
    to K separate tex_fetch_row calls — same code path, batched."""
    if len(rows_list) == 1:
        return [tex_fetch_row(scene, rows_list[0], uv, apply_gamma)]
    rows = jnp.concatenate(rows_list, axis=0)
    uvk = jnp.concatenate([uv] * len(rows_list), axis=0)
    out = tex_fetch_row(scene, rows, uvk, apply_gamma)
    R = uv.shape[0]
    return [out[i * R:(i + 1) * R] for i in range(len(rows_list))]


def tex_fetch(scene, tex_id, uv, apply_gamma: bool = False):
    """Bilinear fetch by texture slot id through the baked tex_meta rows."""
    return tex_fetch_row(scene, scene.tex_meta[tex_id], uv, apply_gamma)


def sample_tex_row_quad(quad, row, uv, apply_gamma: bool = False):
    """sample_tex_row against the (X,16) bilinear-quad heap
    (textures.build_quad_heap): the 2x2 footprint arrives in ONE gathered
    row — 1/4 the gather rows of the 4-corner fetch, bit-identical output
    (neighbor wrap is pre-baked per texture; the clamp x0<0 corner collapse
    is reproduced by zeroing the fraction)."""
    import jax
    meta_i = jax.lax.bitcast_convert_type(row[:, 0:4], jnp.int32)
    off, w, h, flags = meta_i[:, 0], meta_i[:, 1], meta_i[:, 2], meta_i[:, 3]
    wf, hf = w.astype(jnp.float32), h.astype(jnp.float32)

    u_in = row[:, 4] * uv[:, 0] + row[:, 5] * uv[:, 1] + row[:, 6]
    v_in = row[:, 7] * uv[:, 0] + row[:, 8] * uv[:, 1] + row[:, 9]
    gamma = row[:, 10]

    clamp_u = (flags & TEX_CLAMP_U) != 0
    clamp_v = (flags & TEX_CLAMP_V) != 0
    u = jnp.where(clamp_u, jnp.clip(u_in, 0.0, 1.0), u_in - jnp.floor(u_in))
    v = jnp.where(clamp_v, jnp.clip(v_in, 0.0, 1.0), v_in - jnp.floor(v_in))
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # clamp addressing collapses the x0 = -1 corner pair onto texel 0 in the
    # 4-corner fetch; zeroing the fraction reproduces that exactly
    fx = jnp.where(clamp_u & (x0 < 0.0), 0.0, x - x0)[:, None]
    fy = jnp.where(clamp_v & (y0 < 0.0), 0.0, y - y0)[:, None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    xa = jnp.where(clamp_u, jnp.clip(x0i, 0, w - 1),
                   jnp.mod(x0i, jnp.maximum(w, 1)))
    ya = jnp.where(clamp_v, jnp.clip(y0i, 0, h - 1),
                   jnp.mod(y0i, jnp.maximum(h, 1)))
    q = quad[off + ya * w + xa]  # (R, 16)
    top = q[:, 0:4] * (1 - fx) + q[:, 4:8] * fx
    bot = q[:, 8:12] * (1 - fx) + q[:, 12:16] * fx
    out = top * (1 - fy) + bot * fy
    if apply_gamma:
        rgb = jnp.where((gamma != 1.0)[:, None],
                        jnp.power(jnp.maximum(out[:, :3], 0.0), gamma[:, None]),
                        out[:, :3])
        out = jnp.concatenate([rgb, out[:, 3:4]], axis=1)
    return out


def sample_bilinear(texels, tex_table, tex_id, uv, samplers=None,
                    apply_gamma: bool = False):
    """Bilinear RGBA fetch.

    texels: (X, 4) float32 heap; tex_table: (K, 4) int32 [offset, w, h,
    flags]; tex_id: (R,) int32 slot (0 = white); uv: (R, 2) float32;
    samplers: optional (K, 8) f32 [m00 m01 tu m10 m11 tv gamma 0].
    Returns (R, 4) float32 (gamma-linearized rgb when samplers given).
    """
    rec = tex_table[tex_id]  # (R,4)
    off, w, h, flags = rec[:, 0], rec[:, 1], rec[:, 2], rec[:, 3]
    wf, hf = w.astype(jnp.float32), h.astype(jnp.float32)

    u_in, v_in = uv[:, 0], uv[:, 1]
    gamma = None
    if samplers is not None:
        sm = samplers[tex_id]  # (R,8)
        u_in = sm[:, 0] * uv[:, 0] + sm[:, 1] * uv[:, 1] + sm[:, 2]
        v_in = sm[:, 3] * uv[:, 0] + sm[:, 4] * uv[:, 1] + sm[:, 5]
        gamma = sm[:, 6]

    clamp_u = (flags & TEX_CLAMP_U) != 0
    clamp_v = (flags & TEX_CLAMP_V) != 0
    u = jnp.where(clamp_u, jnp.clip(u_in, 0.0, 1.0),
                  u_in - jnp.floor(u_in))
    v = jnp.where(clamp_v, jnp.clip(v_in, 0.0, 1.0),
                  v_in - jnp.floor(v_in))
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def texel(xi, yi):
        xi = xi.astype(jnp.int32)
        yi = yi.astype(jnp.int32)
        xi = jnp.where(clamp_u, jnp.clip(xi, 0, w - 1),
                       jnp.mod(xi, jnp.maximum(w, 1)))
        yi = jnp.where(clamp_v, jnp.clip(yi, 0, h - 1),
                       jnp.mod(yi, jnp.maximum(h, 1)))
        return texels[off + yi * w + xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    out = top * (1 - fy) + bot * fy
    if gamma is not None and apply_gamma:
        rgb = jnp.where((gamma != 1.0)[:, None],
                        jnp.power(jnp.maximum(out[:, :3], 0.0), gamma[:, None]),
                        out[:, :3])
        out = jnp.concatenate([rgb, out[:, 3:4]], axis=1)
    return out
