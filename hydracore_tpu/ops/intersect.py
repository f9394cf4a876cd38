"""Ray-triangle and ray-box primitives (jnp, vectorized over rays x prims).

Device analogue of the leaf intersectors in hydra_drv/ctrace.h
(IntersectAllPrimitivesInLeaf:124-318, Möller–Trumbore over triangle4v
packs). Everything is branch-free masked math — TPU VPU friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

HIT_EPS = 1e-5


def moller_trumbore(ray_o, ray_d, v0, e1, e2, t_min=HIT_EPS, t_max=1e30):
    """Intersect rays (..., 3) against triangles (..., 3) elementwise on the
    broadcasted shape. Returns (t, u, v, hit_mask); t=inf on miss."""
    p = jnp.cross(ray_d, e2)
    det = (e1 * p).sum(-1)
    ok = jnp.abs(det) > 1e-12
    inv = jnp.where(ok, 1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    s = ray_o - v0
    u = (s * p).sum(-1) * inv
    q = jnp.cross(s, e1)
    v = (ray_d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > t_min) & (t < t_max)
    return jnp.where(hit, t, jnp.inf), u, v, hit


def want_double(scene) -> bool:
    """True when the scene asked for f64 hit refinement (-double_rt, the
    reference's -D DOUBLE_RAY_TRIANGLE variant, GPUOCLLayer.cpp:695-700)
    AND jax x64 is actually enabled (otherwise float64 silently downcasts
    to f32 — a no-op we refuse to pretend is double precision)."""
    import jax

    st = getattr(scene, "settings", None)
    return bool(st is not None and getattr(st, "double_rt", False)
                and jax.config.jax_enable_x64)


def mt_refine(ray_o, ray_d, v0, e1, e2, f64: bool = False):
    """Exact (t, u, v) for paired rays/triangles (..., 3) — no hit logic,
    the caller owns validity. With f64, the arithmetic runs in float64
    and rounds the results back to f32 (the -double_rt refinement)."""
    if f64:
        ray_o, ray_d, v0, e1, e2 = (x.astype(jnp.float64)
                                    for x in (ray_o, ray_d, v0, e1, e2))
    p = jnp.cross(ray_d, e2)
    det = (e1 * p).sum(-1)
    eps = 1e-24 if f64 else 1e-12
    inv = jnp.where(jnp.abs(det) > eps,
                    1.0 / jnp.where(det == 0.0, 1.0, det), 0.0)
    s = ray_o - v0
    u = (s * p).sum(-1) * inv
    q = jnp.cross(s, e1)
    v = (ray_d * q).sum(-1) * inv
    t = (e2 * q).sum(-1) * inv
    return (t.astype(jnp.float32), u.astype(jnp.float32),
            v.astype(jnp.float32))


def ray_box(ray_o, inv_d, bmin, bmax, t_max):
    """Slab test. ray_o/inv_d (...,3), boxes (...,3). Returns (t_near, hit)."""
    t0 = (bmin - ray_o) * inv_d
    t1 = (bmax - ray_o) * inv_d
    tn = jnp.minimum(t0, t1).max(axis=-1)
    tf = jnp.maximum(t0, t1).min(axis=-1)
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_max)
    return tn, hit
