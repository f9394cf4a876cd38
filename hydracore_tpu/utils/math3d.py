"""Vector / matrix helpers shared by host (numpy) and device (jnp) code.

All functions are written against the array-API subset common to numpy and
jax.numpy so the same math runs in scene compilation (host) and in jitted
kernels (device). Vectors are (..., 3) float32 arrays.

Reference semantics: hydra_drv/cglobals.h float4x4 helpers and the ray
offsetting rules (OffsRayPos) used throughout the integrators.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EPS_HIT = 1e-5


def dot3(a, b):
    return (a * b).sum(axis=-1)


def cross3(a, b):
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    bx, by, bz = b[..., 0], b[..., 1], b[..., 2]
    return jnp.stack([ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx], axis=-1)


def length3(a):
    return jnp.sqrt(jnp.maximum(dot3(a, a), 0.0))


def normalize3(a, eps: float = 1e-20):
    return a / jnp.sqrt(jnp.maximum(dot3(a, a), eps))[..., None]


def reflect3(d, n):
    """Reflect direction d about normal n (d points INTO the surface)."""
    return d - 2.0 * dot3(d, n)[..., None] * n


def make_orthonormal_basis(n):
    """Build (tangent, bitangent) for normal n — branchless Frisvad-style.

    Matches the role of MakeOrthonormalBasis in the reference device code
    (cglobals.h) but uses the Pixar/Frisvad construction which is stable for
    vectorized evaluation (no data-dependent branches).
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    t = jnp.stack([1.0 + sign * nx * nx * a, sign * b, -sign * nx], axis=-1)
    bt = jnp.stack([b, sign + ny * ny * a, -ny], axis=-1)
    return t, bt


def map_to_hemisphere(n, u1, u2, power: float = 1.0):
    """Cosine^power-weighted hemisphere sample around n.

    power=1 gives cosine-weighted sampling used by lambert; higher powers are
    used by phong-style lobes. Mirrors MapSampleToCosineDistribution /
    MapSampleToModifiedCosineDistribution (cglobals.h).
    """
    t, bt = make_orthonormal_basis(n)
    cos_theta = jnp.power(jnp.maximum(1.0 - u1, 1e-10), 1.0 / (power + 1.0))
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    phi = 2.0 * np.pi * u2
    local = jnp.stack([sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1)
    return (
        local[..., 0:1] * t + local[..., 1:2] * bt + local[..., 2:3] * n
    )


def offs_ray_pos(pos, n, direction, eps: float = 1e-4):
    """Offset a secondary-ray origin off the surface to avoid self-hit.

    The reference stores a per-polygon shadow offset (sRayOff); we use a
    direction-aware epsilon along the geometric normal (flip for refraction),
    scaled with distance from origin for large scenes.
    """
    scale = jnp.maximum(jnp.abs(pos).max(axis=-1), 1.0)
    signed = jnp.where(dot3(direction, n) >= 0.0, 1.0, -1.0)
    return pos + (eps * scale * signed)[..., None] * n


def transform_point(m, p):
    """Apply a 4x4 row-major matrix (..., 4, 4) to points (..., 3)."""
    r = (
        m[..., :3, :3] @ p[..., :, None]
    )[..., 0] + m[..., :3, 3]
    return r


def transform_dir(m, d):
    return (m[..., :3, :3] @ d[..., :, None])[..., 0]


def transform_normal(m_inv, n):
    """Transform a normal with the inverse matrix (n' = n @ M^-1)."""
    return (n[..., None, :] @ m_inv[..., :3, :3])[..., 0, :]


# ----------------------------------------------------------------------------
# Host-side (numpy) matrix builders for camera / instancing
# ----------------------------------------------------------------------------

def np_look_at(eye, center, up):
    """Right-handed lookAt view matrix (row-major 4x4 numpy array)."""
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[0, 3] = -np.dot(s, eye)
    m[1, 3] = -np.dot(u, eye)
    m[2, 3] = np.dot(f, eye)  # z row is -f, so translation is +f.eye
    return m


def np_perspective(fov_deg: float, aspect: float, z_near: float, z_far: float):
    """OpenGL-style perspective projection (row-major), fov is vertical."""
    ymax = z_near * np.tan(np.deg2rad(fov_deg) * 0.5)
    xmax = ymax * aspect
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 0] = z_near / xmax
    m[1, 1] = z_near / ymax
    m[2, 2] = -(z_far + z_near) / (z_far - z_near)
    m[2, 3] = -2.0 * z_far * z_near / (z_far - z_near)
    m[3, 2] = -1.0
    return m
