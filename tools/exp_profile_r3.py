"""Round-3 stage profile with tunnel-proof differential timing.

Measures, at a given resolution on test_224:
  - marginal cost per bounce: render_passes at depth 1/2/3/5 (diff in n_pass
    cancels the sticky per-call tunnel latency; diff across depths gives the
    per-bounce cost)
  - traversal-only cost: jitted fori loop chaining closest_hit N vs M times
    (output feeds back into the ray origin so XLA cannot CSE the calls)
  - shadow-only cost: same for any_hit
Prints a JSON dict. Usage: python tools/exp_profile_r3.py [W] [scene_dir]
"""
from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hydracore_tpu.integrators.pt import (_morton_pixel_order, make_eye_rays,
                                          render_passes)
from hydracore_tpu.ops import rng as _rng
from hydracore_tpu.ops.trace_api import (any_hit, closest_hit, ray_sort_key)
from hydracore_tpu.scene.scene import load_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
SCENE = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/reference/hydra_app/tests/test_224"

scene = jax.device_put(load_scene(SCENE, width=W, height=W))
seed = jnp.uint32(777)
R = W * W

pix = jnp.asarray(_morton_pixel_order(W, W))
px = (pix % W).astype(jnp.int32)
py = (pix // W).astype(jnp.int32)
jitter = _rng.screen_sample(jnp.zeros(R, jnp.uint32), pix)
lens = jnp.zeros((R, 2), jnp.float32)
ray_o, ray_d = make_eye_rays(scene.camera, px, py, jitter, lens)


def diff_time(fn, lo, hi, reps=2):
    """fn(n) runs the op n times in one dispatch; returns s per op."""
    fn(lo)
    fn(hi)  # compile both
    ts = {lo: 0.0, hi: 0.0}
    for _ in range(reps):
        for n in (lo, hi):
            t0 = time.perf_counter()
            fn(n)
            ts[n] += time.perf_counter() - t0
    return (ts[hi] - ts[lo]) / (reps * (hi - lo))


# ---- traversal-only: chained closest_hit -------------------------------
@jax.jit
def trav_n(o, d, n):
    def body(i, st):
        o_, d_ = st
        t, tri, u, v = closest_hit(scene, o_, d_)
        # fold the result back in (prevents CSE); keep rays valid
        t_ = jnp.where(jnp.isfinite(t), t, 0.0)
        o2 = o_ + (t_ * 1e-7)[:, None] * d_
        return o2, d_

    o, d = jax.lax.fori_loop(0, n, body, (o, d))
    return o


@jax.jit
def shadow_n(o, d, n):
    def body(i, st):
        o_, acc = st
        occ = any_hit(scene, o_, d, 1e30)
        o2 = o_ + jnp.where(occ, 1e-7, 0.0)[:, None] * d
        return o2, acc + occ.sum()

    o, acc = jax.lax.fori_loop(0, n, body, (o, acc := jnp.zeros((), jnp.int32)))
    return acc


def run_trav(n):
    np.asarray(trav_n(ray_o, ray_d, n))


def run_shadow(n):
    np.asarray(shadow_n(ray_o, ray_d, n))


def run_pass(depth):
    def f(n):
        fb, _ = render_passes(scene, jnp.uint32(0), seed, n_pass=n,
                              max_depth=depth)
        np.asarray(fb)
    return f


out = {}
out["trav_ms"] = diff_time(run_trav, 2, 8) * 1e3
out["shadow_ms"] = diff_time(run_shadow, 2, 8) * 1e3
for d in (1, 2, 3, 5):
    out[f"pass_d{d}_ms"] = diff_time(run_pass(d), 1, 3) * 1e3
out["per_bounce_d3_d5_ms"] = (out["pass_d5_ms"] - out["pass_d3_ms"]) / 2
out["W"] = W
out["Msamples/s_d5"] = R / out["pass_d5_ms"] / 1e3
print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                  for k, v in out.items()}))
