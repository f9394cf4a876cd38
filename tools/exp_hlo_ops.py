"""Static op-census of the PT pass: count gather/scatter/sort/while ops in
the optimized HLO. Each such op costs ~1.6 ms of fixed overhead on this TPU
(tools/exp_gather.py), so the census IS the floor model — and unlike the
timing tools it works with the tunnel down (HLO structure is backend-stable
for these op kinds on CPU).

Usage: HC_CPU=1 python tools/exp_hlo_ops.py [scene_dir] [n_pass]
Prints per-op-kind counts for render_passes_band at 512^2 and divides by
(n_pass * depth) for a per-bounce rate.
"""
from __future__ import annotations

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

if os.environ.get("HC_CPU"):
    jax.config.update("jax_platforms", "cpu")

from hydracore_tpu.integrators.pt import render_passes_band
from hydracore_tpu.scene.scene import load_scene

SCENE = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/hydra_app/tests/test_224"
N_PASS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

scene = jax.device_put(load_scene(SCENE, width=512, height=512))
depth = scene.settings.trace_depth

lowered = jax.jit(
    render_passes_band, static_argnames=("n_pass", "max_depth", "band")
).lower(scene, jnp.uint32(0), jnp.uint32(7), n_pass=N_PASS,
         max_depth=depth, band=(0, 1 << 18))
compiled = lowered.compile()
hlo = compiled.as_text()

KINDS = ("gather", "scatter", "sort", "while", "iota", "dynamic-slice",
         "dynamic-update-slice", "all-reduce", "custom-call")
counts = collections.Counter()
pat = re.compile(r"= .*?\b(" + "|".join(re.escape(k) for k in KINDS)
                 + r")(?:\.\d+)?\(")
for line in hlo.splitlines():
    m = pat.search(line)
    if m:
        counts[m.group(1)] += 1

total_bounces = N_PASS * depth
print(f"scene={SCENE} n_pass={N_PASS} depth={depth} "
      f"(per-bounce divisor {total_bounces})")
for k in KINDS:
    c = counts[k]
    print(f"  {k:22s} {c:5d}  ({c / total_bounces:6.2f}/bounce)")
print(f"  HLO lines: {len(hlo.splitlines())}")

# breakdown of gather output shapes (which row-gathers remain?)
if os.environ.get("HC_GATHER_SHAPES"):
    shapes = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"= (\S+?) gather\(", line)
        if m:
            shapes[m.group(1)] += 1
    for s, c in shapes.most_common():
        print(f"  gather -> {s:40s} x{c}")
