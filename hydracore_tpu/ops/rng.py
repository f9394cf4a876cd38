"""Stateless counter-based RNG + low-discrepancy sampling for the tracer.

Design note (deliberate departure from the reference): HydraCore carries a
mutable 2x32-bit LCG state per ray (hydra_drv/crandom.h:10-43, RandomGen /
NextState) plus a Niederreiter QMC table remapped through rmQMC
(hydra_drv/cfetch.h:19-33). Mutable per-ray state forces a serialized
read-modify-write chain through every kernel. On TPU we instead derive every
random number as a pure function of (sample_index, bounce, dimension, seed)
— a counter-based PCG/Wang-hash construction — so any kernel can reproduce
any ray's randomness with zero carried state and the whole stream is
trivially sharded across chips by offsetting sample_index
(sample = pass * n_chips * block + chip * block + lane, SURVEY.md §5).

Low-discrepancy path: scrambled (Owen-ish via per-dimension random digit
XOR) Sobol for the first dimensions, mirroring the reference's qmc_variant
usage for screen/lens/material/light dims (hydra_drv/cglobals.h:81-124).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32


def _u32(x):
    if isinstance(x, int):
        x = np.uint32(x & 0xFFFFFFFF)
    return jnp.asarray(x, dtype=_U32)


def pcg3d(v):
    """PCG3D hash (Jarzynski & Olano, JCGT 2020): uint32[...,3] -> uint32[...,3]."""
    v = v.astype(_U32)
    v = v * _u32(1664525) + _u32(1013904223)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return jnp.stack([x, y, z], axis=-1)


def hash_u32(x):
    """lowbias32 scalar hash."""
    x = _u32(x)
    x ^= x >> 16
    x *= _u32(0x7FEB352D)
    x ^= x >> 15
    x *= _u32(0x846CA68B)
    x ^= x >> 16
    return x


def _to_unit_float(bits):
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def rand4(sample_index, bounce, dim_group, seed=0):
    """Four uniform floats for (sample, bounce, dimension-group).

    Replaces the reference's rndFloat4_Pseudo + QMC slot remap: a given
    (sample, bounce, group) always yields the same numbers on any device.
    dim_group enumerates consumption sites per bounce (0=lens, 1=bsdf,
    2=light, 3=aux — see cglobals.h QMC_VAR_* roles).
    """
    sample_index = _u32(sample_index)
    shape = jnp.shape(sample_index)
    mix = _u32(bounce) * _u32(0x9E3779B9) ^ _u32(dim_group) * _u32(0x85EBCA6B)
    key = jnp.stack(
        [
            sample_index,
            jnp.broadcast_to(mix, shape),
            jnp.broadcast_to(_u32(seed), shape),
        ],
        axis=-1,
    )
    h = pcg3d(key)
    w = hash_u32(h[..., 0] ^ h[..., 1] ^ h[..., 2] ^ _u32(0x27220A95))
    bits = jnp.stack([h[..., 0], h[..., 1], h[..., 2], w], axis=-1)
    return _to_unit_float(bits)


def rand1(sample_index, bounce, dim_group, seed=0):
    return rand4(sample_index, bounce, dim_group, seed)[..., 0]


def rand2(sample_index, bounce, dim_group, seed=0):
    return rand4(sample_index, bounce, dim_group, seed)[..., :2]


# ----------------------------------------------------------------------------
# Sobol (base-2 digital net) with random digit scrambling for screen dims
# ----------------------------------------------------------------------------

def _sobol_direction_numbers(n_dims: int = 8) -> np.ndarray:
    """Direction numbers for the first few Sobol dimensions (Joe–Kuo style).

    Dimension 0 is van der Corput. Hand-rolled initial direction values for
    dims 1..7 from the classic primitive-polynomial table; enough for the
    screen/lens/bsdf dims the renderer draws from the LDS stream (the
    reference similarly keeps a fixed 16-slot rmQMC remap, cfetch.h:19).
    """
    # (degree s, polynomial coefficient a, m initial values)
    table = [
        (1, 0, [1]),
        (2, 1, [1, 3]),
        (3, 1, [1, 3, 1]),
        (3, 2, [1, 1, 1]),
        (4, 1, [1, 1, 3, 3]),
        (4, 4, [1, 3, 5, 13]),
        (5, 2, [1, 1, 5, 5, 17]),
    ]
    V = np.zeros((n_dims, 32), dtype=np.uint64)
    # dim 0: van der Corput
    for i in range(32):
        V[0, i] = 1 << (31 - i)
    for d in range(1, n_dims):
        s, a, m = table[(d - 1) % len(table)]
        m = list(m)
        for i in range(32):
            if i < s:
                V[d, i] = np.uint64(m[i]) << np.uint64(31 - i)
            else:
                v = V[d, i - s] ^ (V[d, i - s] >> np.uint64(s))
                for k in range(1, s):
                    if (a >> (s - 1 - k)) & 1:
                        v ^= V[d, i - k]
                V[d, i] = v
    return V.astype(np.uint32)


_SOBOL_V = _sobol_direction_numbers(8)


def sobol(index, dim: int, scramble: int = 0):
    """Sobol sample for integer index (any-shape uint32 array), dimension dim.

    XOR-scrambled with a per-dimension seed (digital shift) — cheap
    decorrelation between pixels/chips in the spirit of Owen scrambling.
    """
    v = jnp.asarray(_SOBOL_V[dim], dtype=_U32)  # (32,)
    idx = _u32(index)
    bits = jnp.zeros_like(idx)
    for b in range(32):
        bit = (idx >> b) & _u32(1)
        bits = bits ^ (bit * v[b])
    bits = bits ^ _u32(scramble)
    return _to_unit_float(bits)


def screen_sample(sample_index, pixel_hash, dim0: int = 0):
    """2D anti-aliasing jitter: Sobol in (dim0, dim0+1), Cranley-Patterson
    rotated per pixel so neighbouring pixels decorrelate."""
    sx = sobol(sample_index, dim0)
    sy = sobol(sample_index, dim0 + 1)
    rot = pcg3d(
        jnp.stack(
            [_u32(pixel_hash), _u32(pixel_hash) ^ _u32(0xDEADBEEF), _u32(0x12345678) + jnp.zeros_like(_u32(pixel_hash))],
            axis=-1,
        )
    )
    rx = _to_unit_float(rot[..., 0])
    ry = _to_unit_float(rot[..., 1])
    jx = sx + rx
    jy = sy + ry
    return jnp.stack([jx - jnp.floor(jx), jy - jnp.floor(jy)], axis=-1)
