"""Row-gather strategies tuned to this TPU's gather cost model.

XLA lowers `table[idx]` to a serialized per-row gather (~1 row/cycle,
tools/exp_gather.py, tools/exp_stage_floor.py: 0.6-1.1 ms per 256k-row
gather). For SMALL tables (materials, lights — typically < 32 rows) a
broadcast-select chain is far cheaper: N fused VPU selects over the batch,
no serialization, and — unlike a one-hot matmul — EXACT, bit-copying rows
(material rows carry bitcast-int texture metadata that must not round-trip
through bf16).

The reference has no analogue (OpenCL gathers are hardware-native);
this is a TPU-specific replacement for its per-field fetches
(hydra_drv/cfetch.h materialHeadFetch / lightHeadFetch).
"""
from __future__ import annotations

import jax.numpy as jnp

# above this many rows the select chain loses to the serialized gather
# (N broadcast selects ~ N * R lanes of VPU work vs R rows of gather)
SELECT_MAX_ROWS = 48


def gather_rows(table, idx):
    """table[idx] for 2D `table` (N, W) and int `idx` (R,), clipped to
    range. Select-chain for small N (exact bit-copy), XLA gather
    otherwise."""
    n = table.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    if n > SELECT_MAX_ROWS:
        return table[idx]
    out = jnp.broadcast_to(table[0], (idx.shape[0], table.shape[1]))
    for k in range(1, n):
        out = jnp.where((idx == k)[:, None], table[k], out)
    return out


def gather_1d(vec, idx):
    """vec[idx] for 1D `vec` (N,) with the same small-N select strategy."""
    n = vec.shape[0]
    idx = jnp.clip(idx, 0, n - 1)
    if n > SELECT_MAX_ROWS:
        return vec[idx]
    out = jnp.broadcast_to(vec[0], idx.shape)
    for k in range(1, n):
        out = jnp.where(idx == k, vec[k], out)
    return out
