"""Image-space filters: bilateral, non-local means, height->normal.

TPU rebuild of the reference post ops (CPUBilateralFilter2D.cpp:16,
shaders/image.cl: BilateralFilter:123, NonLocalMeansFilter:241,
NormalmapFromHeight:37). All filters are jnp shift-stacks — every tap is a
rolled copy of the image so the whole filter fuses into dense VPU work (no
gather).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift2(img, dy, dx):
    return jnp.roll(img, (dy, dx), axis=(0, 1))


@partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(img, sigma_s: float = 2.0, sigma_r: float = 0.1, radius: int = 3):
    """Edge-preserving smoothing of (H, W, 3)."""
    acc = jnp.zeros_like(img)
    wacc = jnp.zeros(img.shape[:2], img.dtype)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            nb = _shift2(img, dy, dx)
            w_s = jnp.exp(-(dy * dy + dx * dx) / (2 * sigma_s * sigma_s))
            d = ((nb - img) ** 2).sum(-1)
            w = w_s * jnp.exp(-d / (2 * sigma_r * sigma_r))
            acc = acc + nb * w[..., None]
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-8)[..., None]


@partial(jax.jit, static_argnames=("search_radius", "patch_radius"))
def nlm_filter(img, h: float = 0.1, search_radius: int = 4, patch_radius: int = 1):
    """Non-local means over (H, W, 3): patch distances via box-filtered
    squared differences of shifted images."""
    # box filter for patch aggregation
    def boxf(x):
        k = 2 * patch_radius + 1
        for axis in (0, 1):
            x = sum(jnp.roll(x, s, axis=axis) for s in range(-patch_radius, patch_radius + 1)) / k
        return x

    acc = jnp.zeros_like(img)
    wacc = jnp.zeros(img.shape[:2], img.dtype)
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            nb = _shift2(img, dy, dx)
            d2 = boxf(((nb - img) ** 2).sum(-1))
            w = jnp.exp(-jnp.maximum(d2 - 2 * h * h, 0.0) / (h * h))
            acc = acc + nb * w[..., None]
            wacc = wacc + w
    return acc / jnp.maximum(wacc, 1e-8)[..., None]


@jax.jit
def normalmap_from_height(height, amount: float = 1.0):
    """(H, W) height -> (H, W, 3) tangent-space normal map in [-1, 1]
    (Sobel gradients, ref image.cl:37)."""
    h = height

    def sobel(img, axis):
        # roll(+1) fetches the PREVIOUS texel, so the forward neighbor is
        # shift(-1): gradient = (next - prev) taps
        if axis == 0:  # d/dy
            g = (_shift2(img, -1, -1) + 2 * _shift2(img, -1, 0) + _shift2(img, -1, 1)
                 - _shift2(img, 1, -1) - 2 * _shift2(img, 1, 0) - _shift2(img, 1, 1))
        else:  # d/dx
            g = (_shift2(img, -1, -1) + 2 * _shift2(img, 0, -1) + _shift2(img, 1, -1)
                 - _shift2(img, -1, 1) - 2 * _shift2(img, 0, 1) - _shift2(img, 1, 1))
        return g / 8.0

    gx = sobel(h, 1) * amount
    gy = sobel(h, 0) * amount
    n = jnp.stack([-gx, -gy, jnp.ones_like(h)], -1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
