"""Experiment: XLA gather cost vs row width / op count on this TPU.

Decides the gather-packing design: if cost is per-OP (fixed ~1ms), packing
15 narrow gathers into one wide gather is ~15x; if per-ROW-BYTE, packing
only saves op overhead.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

R = 262144
T = 25614
N_REP = 32


def scan_time(label, fn, *args):
    @jax.jit
    def run(i0, *rest):
        def body(carry, _):
            out = fn(i0 + carry, *rest)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
            return (s * 0.0).astype(jnp.int32), s

        _, ss = jax.lax.scan(body, jnp.int32(0), None, length=N_REP)
        return ss[-1]

    out = run(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    np.asarray(run(*args))
    dt = (time.perf_counter() - t0) / N_REP
    print(f"{label:40s}: {dt*1e3:8.3f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    idx = jax.device_put(jnp.asarray(rng.integers(0, T, R, dtype=np.int32)))
    idx_sorted = jax.device_put(jnp.sort(idx))
    tbl3 = jax.device_put(jnp.asarray(rng.normal(size=(T, 3)).astype(np.float32)))
    tbl8 = jax.device_put(jnp.asarray(rng.normal(size=(T, 8)).astype(np.float32)))
    tbl48 = jax.device_put(jnp.asarray(rng.normal(size=(T, 48)).astype(np.float32)))
    tbl128 = jax.device_put(jnp.asarray(rng.normal(size=(T, 128)).astype(np.float32)))
    tbl1 = jax.device_put(jnp.asarray(rng.normal(size=(T,)).astype(np.float32)))

    scan_time("1x gather (T,) scalar", lambda i: tbl1[i], idx)
    scan_time("1x gather (T,3)", lambda i: tbl3[i], idx)
    scan_time("1x gather (T,8)", lambda i: tbl8[i], idx)
    scan_time("1x gather (T,48)", lambda i: tbl48[i], idx)
    scan_time("1x gather (T,128)", lambda i: tbl128[i], idx)
    scan_time("15x gather (T,3)", lambda i: [tbl3[(i + k) % T] for k in range(15)], idx)
    scan_time("15x gather (T,3) same idx", lambda i: [tbl3[i] * k for k in range(15)], idx)
    scan_time("1x gather (T,48) sorted idx", lambda i: tbl48[i], idx_sorted)
    scan_time("4-in-1 texel gather (4R,4)",
              lambda i: tbl8[jnp.concatenate([i, i + 1, i + 7, i + 8]) % T],
              idx)

    # sort cost at wavefront size
    key = jax.device_put(jnp.asarray(rng.integers(0, 2**31, R, dtype=np.int32)))
    val = jnp.arange(R, dtype=jnp.int32)
    scan_time("sort_key_val u32 262k", lambda k: jax.lax.sort_key_val(k, val), key)
    f3 = jax.device_put(jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)))

    def permute13(k):
        _, perm = jax.lax.sort_key_val(k, val)
        return f3[perm], f3[perm] * 2.0, f3[perm] * 3.0, f3[perm, 0] * 4.0, perm

    scan_time("sort + permute 13 floats", permute13, key)
    scan_time("scatter .at[idx].set (R,3)",
              lambda i: jnp.zeros((T, 3), jnp.float32).at[i % T].set(f3), idx)


if __name__ == "__main__":
    main()
