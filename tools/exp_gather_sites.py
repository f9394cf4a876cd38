"""Attribute expensive ops (gather/scatter/sort/while) in the PT pass to
repo source lines, by walking the closed jaxpr's equations' source_info.
Works offline (CPU trace). The census (exp_hlo_ops.py) counts the optimized
HLO; this maps the *traced* ops to code, which is where fusion work starts.

Usage: python tools/exp_gather_sites.py [scene_dir] [--regen]
"""
from __future__ import annotations

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from hydracore_tpu.scene.scene import load_scene

SCENE = "/root/reference/hydra_app/tests/test_224"
REGEN = "--regen" in sys.argv
for a in sys.argv[1:]:
    if not a.startswith("-"):
        SCENE = a

scene = jax.device_put(load_scene(SCENE, width=512, height=512))
depth = scene.settings.trace_depth

if REGEN:
    from hydracore_tpu.integrators.pt_regen import render_passes_regen as fn
else:
    from hydracore_tpu.integrators.pt import render_passes_band as fn

kwargs = dict(n_pass=4, max_depth=depth)
if not REGEN:
    kwargs["band"] = (0, 1 << 18)
closed = jax.make_jaxpr(
    lambda s, b, sd: fn(s, b, sd, **kwargs))(scene, jnp.uint32(0), jnp.uint32(7))

TRACK = {"gather", "scatter", "scatter-add", "scatter_add", "sort",
         "while", "dynamic_slice", "iota", "argsort"}
sites = collections.Counter()


def frame_of(eqn):
    from jax._src import source_info_util

    try:
        for f in source_info_util.user_frames(eqn.source_info.traceback):
            fname = f.file_name
            if "/root/repo/" in fname and "tools/" not in fname:
                return f"{fname.replace('/root/repo/', '')}:{f.start_line}"
    except Exception:
        pass
    # fallback: raw traceback frames
    try:
        for f in eqn.source_info.traceback.raw_frames():
            fname = f.f_code.co_filename if hasattr(f, "f_code") else ""
            if "/root/repo/" in fname and "tools/" not in fname:
                return f"{fname.replace('/root/repo/', '')}:{f.f_lineno}"
    except Exception:
        pass
    return "<unknown>"


def walk(jaxpr):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in TRACK:
            sites[(name, frame_of(eqn))] += 1
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                walk(v.jaxpr)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        walk(x.jaxpr)


walk(closed.jaxpr)
print(f"scene={SCENE} regen={REGEN}")
for (name, site), c in sorted(sites.items(), key=lambda kv: -kv[1]):
    print(f"  {c:4d}  {name:12s} {site}")
