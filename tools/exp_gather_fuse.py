"""Gather-op fusion pricing: is XLA gather cost per-OP or per-BYTE here?

r4 established gather cost is dominated by per-op overhead
(tools/exp_gather.py). This prices the round-5 fusion candidates:

  a) K separate (R,16) quad-heap gathers  vs  ONE (K*R,16) batched gather
     (the em/diff/refl/opacity/bump texture channels all read the same
     heap at the same uv — _fetch_leaf can stack their indices);
  b) tri_attr (R,40) + mat_attr (R,Wm) as two gathers vs one gather from a
     concatenated (T, 40+Wm) table (tri->mat is static: the merged row can
     be baked at scene build) + a gather width sweep;
  b3) small-table select chain (mat_attr in test_224: 11 x 146) vs XLA
     gather vs a width-pruned chain;
  c) sort_key_val alone vs the (R,17) permute gather alone.

NOTE: tables are passed as jit ARGUMENTS — closure-captured arrays embed
as HLO constants and the axon remote-compile endpoint rejects >~100 MB
payloads (HTTP 413).

Usage: python tools/exp_gather_fuse.py [R]
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

key = np.random.default_rng(0)


def scan_diff(label, step, *tables):
    """step(carry, *tables) -> carry; tables ride as jit args (NOT consts)."""

    def mk(nrep):
        @jax.jit
        def run(c0, *tbs):
            def body(c, _):
                return step(c, *tbs), None

            c, _ = jax.lax.scan(body, c0, None, length=nrep)
            return c

        return run

    run_lo, run_hi = mk(LO), mk(HI)
    float(run_lo(jnp.float32(0.0), *tables))
    float(run_hi(jnp.float32(0.0), *tables))
    ts = {}
    for r, f in ((LO, run_lo), (HI, run_hi), (LO, run_lo), (HI, run_hi)):
        t0 = time.perf_counter()
        float(f(jnp.float32(1.0), *tables))
        ts[r] = ts.get(r, 0.0) + time.perf_counter() - t0
    ms = (ts[HI] - ts[LO]) / (2 * (HI - LO)) * 1e3
    out[label] = round(ms, 3)
    print(f"{label:32s} {ms:8.3f} ms", flush=True)


# a) quad-heap stand-in: 4M rows x 16 f32 (a 2k x 2k RGBA texture's quads)
NH = 1 << 22
HEAP = jax.device_put(key.uniform(0, 1, (NH, 16)).astype(np.float32))
IDX4 = jax.device_put(
    np.stack([key.integers(0, NH, R, dtype=np.int32) for _ in range(4)]))

for k_ch in (1, 2, 4):
    def g_sep(c, heap, idx4, k_ch=k_ch):
        s = c
        for i in range(k_ch):
            rows = heap[(idx4[i] + c.astype(jnp.int32)) % NH]
            s = s + jnp.sum(rows) * 1e-30
        return s

    def g_bat(c, heap, idx4, k_ch=k_ch):
        ii = jnp.concatenate([(idx4[i] + c.astype(jnp.int32)) % NH
                              for i in range(k_ch)])
        rows = heap[ii]
        return jnp.sum(rows) * 1e-30 + c

    scan_diff(f"quad_gather_sep_x{k_ch}", g_sep, HEAP, IDX4)
    scan_diff(f"quad_gather_bat_x{k_ch}", g_bat, HEAP, IDX4)

# b) two-table row gather vs one merged-table gather + width sweep
T2 = 25614
TRI = jax.device_put(key.uniform(0, 1, (T2, 40)).astype(np.float32))
MAT2 = jax.device_put(key.uniform(0, 1, (T2, 40)).astype(np.float32))
MRG = jax.device_put(np.concatenate([np.asarray(TRI), np.asarray(MAT2)], 1))
tri_i = jax.device_put(key.integers(0, T2, R, dtype=np.int32))


def g_two(c, a, b, ti):
    i = (ti + c.astype(jnp.int32)) % T2
    return (jnp.sum(a[i]) + jnp.sum(b[i])) * 1e-30 + c


def g_one(c, m, ti):
    i = (ti + c.astype(jnp.int32)) % T2
    return jnp.sum(m[i]) * 1e-30 + c


scan_diff("rows_tri+mat_2gathers", g_two, TRI, MAT2, tri_i)
scan_diff("rows_tri+mat_merged80", g_one, MRG, tri_i)

for Wd in (40, 144, 184, 256):
    TB = jax.device_put(key.uniform(0, 1, (T2, Wd)).astype(np.float32))
    scan_diff(f"row_gather_w{Wd}", g_one, TB, tri_i)

# b3) small-table select chain vs XLA gather vs width-pruned chain
for nr, wd in ((11, 146), (11, 48), (32, 146)):
    TBs = jax.device_put(key.uniform(0, 1, (nr, wd)).astype(np.float32))
    mi = jax.device_put(key.integers(0, nr, R, dtype=np.int32))

    def g_sel(c, t, i0, nr=nr):
        i = (i0 + c.astype(jnp.int32)) % nr
        o = jnp.broadcast_to(t[0], (R, t.shape[1]))
        for k in range(1, nr):
            o = jnp.where((i == k)[:, None], t[k], o)
        return jnp.sum(o) * 1e-30 + c

    def g_gat(c, t, i0, nr=nr):
        i = (i0 + c.astype(jnp.int32)) % nr
        return jnp.sum(t[i]) * 1e-30 + c

    scan_diff(f"select_chain_{nr}x{wd}", g_sel, TBs, mi)
    scan_diff(f"small_gather_{nr}x{wd}", g_gat, TBs, mi)

# c) sort vs permute decomposition
keys_u = jax.device_put(key.integers(0, 1 << 32, R, dtype=np.uint32))
packed = jax.device_put(key.uniform(0, 1, (R, 17)).astype(np.float32))
packed_bf = jax.device_put(
    np.asarray(key.uniform(0, 1, (R, 17)), np.float32).astype(jnp.bfloat16))
perm0 = jax.device_put(key.permutation(R).astype(np.int32))


def g_sortonly(c, ku):
    k = ku ^ c.astype(jnp.uint32)
    sk, perm = jax.lax.sort_key_val(k, jnp.arange(R, dtype=jnp.int32))
    return (jnp.sum(sk[:2].astype(jnp.float32))
            + jnp.sum(perm[:2].astype(jnp.float32))) * 1e-30 + c


def g_permonly(c, pk, p0):
    p = (p0 + c.astype(jnp.int32)) % R
    return jnp.sum(pk[p].astype(jnp.float32)) * 1e-30 + c


scan_diff("sort_only_u32", g_sortonly, keys_u)
scan_diff("permute17_only", g_permonly, packed, perm0)
scan_diff("permute17_bf16", g_permonly, packed_bf, perm0)

out["R"] = R
print(json.dumps(out))
