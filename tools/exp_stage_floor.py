"""Scene-independent shading-floor breakdown at wavefront size R.

The r03 finding: test_42 (12 tris, dense traversal, no sorts) still costs
~0.47 s/pass at 1024^2 — the bounce loop's *plumbing* floor, not traversal,
bounds the headline. This tool prices each floor component in isolation
with in-dispatch repetition (lax.scan, output fed back to input so XLA
cannot CSE/elide) + differential rep counts, which cancels the tunnel's
sticky per-call latency (bench.py design).

Usage: python tools/exp_stage_floor.py [R] [scene_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
if os.environ.get("HC_CPU"):  # JAX_PLATFORMS is overridden by the harness
    jax.config.update("jax_platforms", "cpu")

from hydracore_tpu.bsdf.core import eval_bsdf, fetch_material, sample_bsdf, scene_feats
from hydracore_tpu.integrators.pt import compute_hit
from hydracore_tpu.lights.sampling import sample_light_rev, select_light
from hydracore_tpu.ops import rng
from hydracore_tpu.scene.scene import load_scene

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
SCENE = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/reference/hydra_app/tests/test_224"

scene = jax.device_put(load_scene(SCENE, width=512, height=512))
feats = scene_feats(scene)

key = np.random.default_rng(0)
pos = jnp.asarray(key.uniform(-3, 3, (R, 3)).astype(np.float32))
d = key.normal(size=(R, 3)).astype(np.float32)
wo = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
n = -wo
uv = jnp.asarray(key.uniform(0, 1, (R, 2)).astype(np.float32))
tri = jnp.asarray(key.integers(0, scene.tri_attr.shape[0], R, dtype=np.int32))
sidx = jnp.arange(R, dtype=jnp.uint32)
seed = jnp.uint32(7)

LO, HI = 4, 16


def scan_diff(label, step):
    """step(carry_f32_scalar) -> f32 scalar; timed at LO and HI reps."""

    def mk(nrep):
        @jax.jit
        def run(c0):
            def body(c, _):
                return step(c), None

            c, _ = jax.lax.scan(body, c0, None, length=nrep)
            return c

        return run

    run_lo, run_hi = mk(LO), mk(HI)
    float(run_lo(jnp.float32(0.0)))
    float(run_hi(jnp.float32(0.0)))
    ts = {}
    for r, f in ((LO, run_lo), (HI, run_hi), (LO, run_lo), (HI, run_hi)):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0)))
        ts[r] = ts.get(r, 0.0) + time.perf_counter() - t0
    ms = (ts[HI] - ts[LO]) / (2 * (HI - LO)) * 1e3
    out[label] = round(ms, 3)
    print(f"{label:28s} {ms:8.3f} ms")


out = {}

# 1. one packed row gather (R,40) from tri_attr
A = scene.tri_attr


def g_row(c):
    idx = (tri + c.astype(jnp.int32)) % A.shape[0]
    return jnp.sum(A[idx][:, :4]) * 1e-30 + c


scan_diff("row_gather_40", g_row)

# 2. RNG rand4
scan_diff("rand4", lambda c: jnp.sum(
    rng.rand4(sidx, 1, 2, seed + c.astype(jnp.uint32))) * 1e-30 + c)

# 3. compute_hit (gather + interp + normalize)
def g_hit(c):
    p_, n_, ng_, uv_, m_, l_, t_ = compute_hit(
        scene, (tri + c.astype(jnp.int32)) % A.shape[0],
        uv[:, 0], uv[:, 1] * 0.5, pos, wo, jnp.ones(R))
    return (jnp.sum(n_) + jnp.sum(uv_)
            + jnp.sum(m_.astype(jnp.float32))) * 1e-30 + c


scan_diff("compute_hit", g_hit)

# 4. fetch_material (mat row gather + tex fetch)
mat_ids = jnp.asarray(key.integers(0, scene.materials.em_color.shape[0], R,
                                   dtype=np.int32))


def g_mat(c):
    p = fetch_material(scene, mat_ids, uv + c * 1e-9, pos, n, wo=wo,
                       u_blend=uv[:, 0])
    return jnp.sum(p.diff_color) * 1e-30 + c


scan_diff("fetch_material", g_mat)

# 5. eval_bsdf + sample_bsdf
p0 = fetch_material(scene, mat_ids, uv, pos, n, wo=wo, u_blend=uv[:, 0])
r4 = rng.rand4(sidx, 0, 1, seed)


def g_bsdf(c):
    wi_v = n + c * 1e-9  # carry-dependent: keeps the eval inside the scan
    f, pdf = eval_bsdf(p0, wo, wi_v, n, feats)
    bs = sample_bsdf(p0, wo, n, r4 + c * 1e-9, feats)
    return (jnp.sum(f) + jnp.sum(bs.wi) + jnp.sum(pdf)) * 1e-30 + c


scan_diff("eval+sample_bsdf", g_bsdf)

# 6. light select + sample
def g_light(c):
    li, pdf = select_light(scene.lights, uv[:, 0] * (1.0 + c * 1e-12))
    ls = sample_light_rev(scene, li, jnp.stack(
        [uv[:, 0], uv[:, 1], uv[:, 0]], 1), pos)
    return (jnp.sum(ls.dir) + jnp.sum(pdf)) * 1e-30 + c


scan_diff("select+sample_light", g_light)

# 7. u32 sort + packed permute (R,17)
packed = jnp.asarray(key.uniform(0, 1, (R, 17)).astype(np.float32))
keys_u = jnp.asarray(key.integers(0, 1 << 32, R, dtype=np.uint32))


def g_sort(c):
    k = keys_u ^ c.astype(jnp.uint32)
    _, perm = jax.lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32))
    return jnp.sum(packed[perm][:, :2]) * 1e-30 + c


scan_diff("sort+permute17", g_sort)

# 8. framebuffer scatter .at[].set
pix = jnp.asarray(key.permutation(R).astype(np.int32))


def g_scat(c):
    fb = jnp.zeros((R, 3), jnp.float32).at[pix].set(packed[:, :3] + c)
    return jnp.sum(fb[:4]) * 1e-30 + c


scan_diff("fb_scatter", g_scat)

out["R"] = R
print(json.dumps(out))
