"""Microbenchmark: Pallas sublane-gather throughput on the TPU.

Decides the round-2 traversal kernel design: if per-ray row gathers from a
VMEM-resident node pool run at >=4 rows/cycle, a per-ray Pallas traversal
wins; if ~1 row/cycle, packet (per-block shared stack) traversal wins.

Measures, for a (S, 128) f32 pool resident in VMEM and (R,) random indices:
  A. take_along_axis along sublanes (idx broadcast across lanes)
  B. one-hot matmul gather (idx -> one-hot (R, S) @ pool) on the MXU
Each in a grid over R-blocks, repeated ITERS times inside the kernel to
amortize dispatch.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

S = 4096       # pool rows (node pool)
R = 262144     # total rays
BLK = 512      # rays per grid step
ITERS = 16     # gathers per block per call (amortize)


def kern_taa(idx_ref, pool_ref, out_ref):
    acc = jnp.zeros((BLK, 128), jnp.float32)
    idx0 = idx_ref[:]  # (BLK, 1) int32
    for it in range(ITERS):
        idx = (idx0 + it) % S
        rows = jnp.take_along_axis(
            pool_ref[:], jnp.broadcast_to(idx, (BLK, 128)), axis=0)
        acc = acc + rows
    out_ref[:] = acc


def kern_onehot(idx_ref, pool_ref, out_ref):
    acc = jnp.zeros((BLK, 128), jnp.float32)
    idx0 = idx_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (BLK, S), 1)
    for it in range(ITERS):
        idx = (idx0 + it) % S
        oh = (col == idx).astype(jnp.bfloat16)
        rows = jnp.dot(oh, pool_ref[:].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc = acc + rows
    out_ref[:] = acc


def run(kern, name, pool, idx):
    f = pl.pallas_call(
        kern,
        grid=(R // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
    )
    g = jax.jit(f)
    t0 = time.perf_counter()
    out = g(idx, pool)
    np.asarray(out)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = g(idx, pool)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n
    rows = R * ITERS
    print(f"{name}: {dt*1e3:.2f} ms -> {rows/dt/1e9:.2f} Grows/s "
          f"({dt*940e6/rows:.2f} cycles/row @940MHz)")
    return dt


def main():
    rng = np.random.default_rng(0)
    pool = jnp.asarray(rng.normal(size=(S, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, S, (R, 1)).astype(np.int32))
    run(kern_taa, "take_along_axis sublane", pool, idx)
    run(kern_onehot, "one-hot MXU matmul   ", pool, idx)


if __name__ == "__main__":
    main()
