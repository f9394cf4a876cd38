"""Procedural textures: jax-traceable user callables.

TPU rebuild of the reference's procedural-texture system
(RenderDriverRTE_ProcTex.cpp: user OpenCL snippets are spliced into
texproc.cl at #PUT_YOUR_PROCEDURAL_TEXTURES_HERE and recompiled at
runtime; ProcTexExec evaluates them per hit). Runtime codegen is replaced
by a registry of jax-traceable Python callables

    fn(uv (R,2), pos (R,3), normal (R,3)) -> color (R,3)

evaluated per hit through lax.switch — "recompilation" is just jit
retracing, which XLA does natively.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_REGISTRY: list = []


def register_proc_tex(fn) -> int:
    """Register a procedural texture; returns its id for material records
    (MaterialTable.diff_proc)."""
    _REGISTRY.append(fn)
    return len(_REGISTRY) - 1


def clear_registry():
    _REGISTRY.clear()


def num_proc_tex() -> int:
    return len(_REGISTRY)


def eval_proc_tex(proc_id, uv, pos, normal):
    """Evaluate registered textures for per-ray ids (R,); id < 0 -> white.
    All branches are traced (lax.switch requires static fns)."""
    if not _REGISTRY:
        return jnp.ones(uv.shape[:-1] + (3,), jnp.float32)

    def white(uv, pos, normal):
        return jnp.ones(uv.shape[:-1] + (3,), jnp.float32)

    # vectorized multi-way select: evaluate each registered fn on the whole
    # batch and select by id (few proc-texes expected per scene; matches the
    # reference's one-switch-per-hit ProcTexExec, texproc.cl:94)
    out = white(uv, pos, normal)
    for i, fn in enumerate(_REGISTRY):
        val = fn(uv, pos, normal)
        out = jnp.where((proc_id == i)[..., None], val, out)
    return out


# ---- built-in examples (the reference ships perlin-style noise in
# VolumePerlin; these double as tests and demos)

def checker(uv, pos, normal, scale: float = 8.0):
    c = (jnp.floor(uv[..., 0] * scale) + jnp.floor(uv[..., 1] * scale)) % 2.0
    return jnp.stack([c, c, c], -1)


def _hash3(p):
    x = jnp.sin(p @ jnp.asarray([[127.1, 269.5, 419.2],
                                 [311.7, 183.3, 371.9],
                                 [74.7, 246.1, 124.6]]).T) * 43758.5453
    return x - jnp.floor(x)


def value_noise3(pos, scale: float = 2.0):
    """Trilinear value noise over world position (R,3) -> (R,)."""
    p = pos * scale
    i = jnp.floor(p)
    f = p - i
    f = f * f * (3.0 - 2.0 * f)
    acc = jnp.zeros(pos.shape[:-1])
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = i + jnp.asarray([dx, dy, dz], jnp.float32)
                v = _hash3(corner)[..., 0]
                w = (jnp.where(dx, f[..., 0], 1 - f[..., 0])
                     * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                     * jnp.where(dz, f[..., 2], 1 - f[..., 2]))
                acc = acc + v * w
    return acc


def perlin_marble(uv, pos, normal):
    n = value_noise3(pos, 2.0) + 0.5 * value_noise3(pos, 4.0) + 0.25 * value_noise3(pos, 8.0)
    t = 0.5 + 0.5 * jnp.sin(pos[..., 0] * 4.0 + n * 6.0)
    return jnp.stack([t, t, t], -1)
