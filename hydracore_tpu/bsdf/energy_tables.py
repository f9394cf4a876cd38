"""Multiscatter energy tables: Monte-Carlo bake of GGX directional albedo.

TPU rebuild of the reference's offline baker (bakeBrdfEnergy/ ->
MSTablesGGX2017.cpp 64x64 ushort table, consumed through
GetMultiscatteringFrom2dTable, cmaterial.h:152). E(mu, alpha) = single-
scatter GGX directional albedo; shading applies the Kulla-Conty style
energy-compensation term  f_ms = (1 - E) weighting so rough metals don't
darken. Bake once (numpy), cache as .npz next to the package.
"""
from __future__ import annotations

import os

import numpy as np

_TABLE_PATH = os.path.join(os.path.dirname(__file__), "ggx_albedo_64.npz")
_SIZE = 64
_SAMPLES = 2048


def _ggx_albedo(mu: float, alpha: float, n_samples: int, rng) -> float:
    """E = int f_ggx(wo, wi) cos dwi via NDF importance sampling."""
    wo = np.array([np.sqrt(max(1 - mu * mu, 0.0)), 0.0, mu])
    u1 = rng.random(n_samples)
    u2 = rng.random(n_samples)
    a2 = alpha * alpha
    ct2 = (1 - u1) / np.maximum(1 + (a2 - 1) * u1, 1e-12)
    ct = np.sqrt(np.clip(ct2, 0, 1))
    st = np.sqrt(np.clip(1 - ct2, 0, 1))
    phi = 2 * np.pi * u2
    h = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    woh = h @ wo
    wi = 2 * woh[:, None] * h - wo
    cos_i = wi[:, 2]
    valid = (cos_i > 0) & (woh > 0)

    def g1(c):
        c = np.maximum(c, 1e-6)
        return 2 * c / (c + np.sqrt(a2 + (1 - a2) * c * c))

    # weight for NDF sampling of reflection: G(wo,wi) * woh / (cos_o * cos_h)
    w = g1(mu) * g1(np.abs(cos_i)) * woh / np.maximum(mu * ct, 1e-9)
    return float(np.where(valid, w, 0.0).mean())


def bake_ggx_albedo(size: int = _SIZE, n_samples: int = _SAMPLES, seed: int = 1) -> np.ndarray:
    rng = np.random.default_rng(seed)
    E = np.zeros((size, size), np.float32)  # rows: alpha, cols: mu
    for i in range(size):
        alpha = max((i + 0.5) / size, 1e-3)
        for j in range(size):
            mu = max((j + 0.5) / size, 1e-3)
            E[i, j] = _ggx_albedo(mu, alpha, n_samples, rng)
    return np.clip(E, 0.0, 1.0)


def get_ggx_albedo_table() -> np.ndarray:
    """Load (or bake + cache) the 64x64 E(alpha, mu) table."""
    if os.path.exists(_TABLE_PATH):
        return np.load(_TABLE_PATH)["E"]
    E = bake_ggx_albedo()
    try:
        np.savez_compressed(_TABLE_PATH, E=E)
    except OSError:
        pass
    return E


def multiscatter_factor(E_table, mu, alpha):
    """Kulla-Conty energy compensation multiplier 1 + (1-E)/E ~ applied to
    the single-scatter lobe, as jnp-friendly table lookup."""
    import jax.numpy as jnp

    size = E_table.shape[0]
    i = jnp.clip((alpha * size).astype(jnp.int32), 0, size - 1)
    j = jnp.clip((mu * size).astype(jnp.int32), 0, size - 1)
    E = E_table[i, j]
    return 1.0 + (1.0 - E) / jnp.maximum(E, 0.05)
