"""Experiment: elementwise cost on (R,3) vs (3,R) vs (R,) layouts, plus
one-hot-matmul vs XLA gather for small tables.

Hypothesis (round 4): the shading floor is dominated by (R,3) arrays whose
minor dim maps to 3 of 128 VPU lanes -> ~2% lane utilization on every
elementwise op. If (3,R) / (R,) run ~10-40x faster, the wavefront state
should be restructured.

Usage: python tools/exp_layout.py [R]
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
if os.environ.get("HC_CPU"):
    jax.config.update("jax_platforms", "cpu")

R = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
LO, HI = 4, 16
out = {}


def scan_diff(label, step, c0=0.0):
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
    print(f"{label:32s} {ms:8.3f} ms", flush=True)


key = np.random.default_rng(0)
a_r3 = jnp.asarray(key.normal(size=(R, 3)).astype(np.float32))
b_r3 = jnp.asarray(key.normal(size=(R, 3)).astype(np.float32))
a_3r = jnp.asarray(np.ascontiguousarray(np.asarray(a_r3).T))
b_3r = jnp.asarray(np.ascontiguousarray(np.asarray(b_r3).T))
ax, ay, az = a_3r[0], a_3r[1], a_3r[2]
bx, by, bz = b_3r[0], b_3r[1], b_3r[2]

N_CHAIN = 20  # elementwise ops in the chain


def chain_r3(c):
    x = a_r3 + c
    for _ in range(N_CHAIN):
        x = x * b_r3 + a_r3
        x = jnp.maximum(x, 0.0) * 0.9999
    return jnp.sum(x[:4]) * 1e-30 + c


def chain_3r(c):
    x = a_3r + c
    for _ in range(N_CHAIN):
        x = x * b_3r + a_3r
        x = jnp.maximum(x, 0.0) * 0.9999
    return jnp.sum(x[:, :4]) * 1e-30 + c


def chain_1d(c):
    xs = [ax + c, ay + c, az + c]
    bs = [bx, by, bz]
    as_ = [ax, ay, az]
    for _ in range(N_CHAIN):
        xs = [jnp.maximum(x * b + a, 0.0) * 0.9999
              for x, b, a in zip(xs, bs, as_)]
    return sum(jnp.sum(x[:4]) for x in xs) * 1e-30 + c


scan_diff(f"chain{N_CHAIN}_(R,3)", chain_r3)
scan_diff(f"chain{N_CHAIN}_(3,R)", chain_3r)
scan_diff(f"chain{N_CHAIN}_3x(R,)", chain_1d)


# normalize + dot, the math3d hot pattern
def nrm_r3(c):
    x = a_r3 + c
    for _ in range(8):
        x = x / jnp.sqrt(jnp.sum(x * x, -1, keepdims=True) + 1e-12)
        x = x + b_r3 * 0.1
    return jnp.sum(x[:4]) * 1e-30 + c


def nrm_1d(c):
    x, y, z = ax + c, ay + c, az + c
    for _ in range(8):
        il = 1.0 / jnp.sqrt(x * x + y * y + z * z + 1e-12)
        x, y, z = x * il + bx * 0.1, y * il + by * 0.1, z * il + bz * 0.1
    return (jnp.sum(x[:4]) + jnp.sum(y[:4])) * 1e-30 + c


scan_diff("normalize8_(R,3)", nrm_r3)
scan_diff("normalize8_3x(R,)", nrm_1d)

# where/select on (R,) masks vs (R,3)
m = jnp.asarray(key.uniform(size=R) > 0.5)


def sel_r3(c):
    x = a_r3 + c
    for _ in range(N_CHAIN):
        x = jnp.where(m[:, None], x * 1.0001, x)
    return jnp.sum(x[:4]) * 1e-30 + c


scan_diff(f"select{N_CHAIN}_(R,3)", sel_r3)

# small-table gather: XLA gather vs one-hot matmul
for T, W in ((64, 64), (256, 64), (64, 128)):
    tbl = jnp.asarray(key.normal(size=(T, W)).astype(np.float32))
    idx = jnp.asarray(key.integers(0, T, R, dtype=np.int32))

    def g_gather(c, tbl=tbl, idx=idx, T=T):
        i = (idx + c.astype(jnp.int32)) % T
        return jnp.sum(tbl[i][:4]) * 1e-30 + c

    def g_onehot(c, tbl=tbl, idx=idx, T=T):
        i = (idx + c.astype(jnp.int32)) % T
        oh = (i[:, None] == jnp.arange(T, dtype=jnp.int32)[None]).astype(
            jnp.bfloat16)
        rows = jnp.dot(oh, tbl.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        return jnp.sum(rows[:4]) * 1e-30 + c

    def g_onehot_f32(c, tbl=tbl, idx=idx, T=T):
        i = (idx + c.astype(jnp.int32)) % T
        oh = (i[:, None] == jnp.arange(T, dtype=jnp.int32)[None]).astype(
            jnp.float32)
        rows = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
        return jnp.sum(rows[:4]) * 1e-30 + c

    scan_diff(f"gather_T{T}_W{W}", g_gather)
    scan_diff(f"onehot_bf16_T{T}_W{W}", g_onehot)
    scan_diff(f"onehot_f32_T{T}_W{W}", g_onehot_f32)

# medium-table gather (tri_attr scale): gather vs sorted-gather
T, W = 25614, 40
tbl = jnp.asarray(key.normal(size=(T, W)).astype(np.float32))
idx = jnp.asarray(key.integers(0, T, R, dtype=np.int32))
idx_s = jnp.sort(idx)
scan_diff(f"gather_T{T}_W{W}",
          lambda c: jnp.sum(tbl[(idx + c.astype(jnp.int32)) % T][:4])
          * 1e-30 + c)
scan_diff(f"gather_T{T}_W{W}_sorted",
          lambda c: jnp.sum(tbl[(idx_s + c.astype(jnp.int32)) % T][:4])
          * 1e-30 + c)

# transcendentals on (R,)
u = jnp.asarray(key.uniform(0.1, 0.9, R).astype(np.float32))
scan_diff("exp+log+sqrt+cos_8x_(R,)",
          lambda c: jnp.sum((jnp.cos(jnp.exp(jnp.log(u + c * 1e-9)
                                             + jnp.sqrt(u))))[:4])
          * 1e-30 + c)

out["R"] = R
print(json.dumps(out))
