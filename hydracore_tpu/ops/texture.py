"""Texture fetch from the packed heap (ops analogue of cfetch.h SWTexSampler
+ read_imagef: bilinear, wrap-repeat, no hardware samplers on TPU — gathers).
"""
from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(texels, tex_table, tex_id, uv):
    """Bilinear RGBA fetch.

    texels: (X, 4) float32 heap; tex_table: (K, 4) int32 [offset, w, h, flags];
    tex_id: (R,) int32 slot (0 = white); uv: (R, 2) float32 (wrap repeat).
    Returns (R, 4) float32.
    """
    rec = tex_table[tex_id]  # (R,4)
    off, w, h = rec[:, 0], rec[:, 1], rec[:, 2]
    wf, hf = w.astype(jnp.float32), h.astype(jnp.float32)

    u = uv[:, 0] - jnp.floor(uv[:, 0])
    v = uv[:, 1] - jnp.floor(uv[:, 1])
    x = u * wf - 0.5
    y = v * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]

    def texel(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), jnp.maximum(w, 1))
        yi = jnp.mod(yi.astype(jnp.int32), jnp.maximum(h, 1))
        return texels[off + yi * w + xi]

    c00 = texel(x0, y0)
    c10 = texel(x0 + 1, y0)
    c01 = texel(x0, y0 + 1)
    c11 = texel(x0 + 1, y0 + 1)
    top = c00 * (1 - fx) + c10 * fx
    bot = c01 * (1 - fx) + c11 * fx
    return top * (1 - fy) + bot * fy
