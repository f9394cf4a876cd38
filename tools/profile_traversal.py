"""Dev tool: profile the wide traversal per-op on the current device.

Usage: python tools/profile_traversal.py [scene_dir] [R]
Dumps the top HLO ops by total time for one warm traversal call.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from hydracore_tpu.ops import traverse_wide as tw
    from hydracore_tpu.scene.scene import load_scene

    scene_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/hydra_app/tests/test_224"
    R = int(sys.argv[2]) if len(sys.argv) > 2 else 262144

    sc = load_scene(scene_dir, width=64, height=64)
    nodes_full = jax.device_put(jnp.asarray(sc.wbvh_nodes))
    tri9f = jax.device_put(jnp.asarray(sc.wbvh_tri9f))
    slot_tri = jax.device_put(jnp.asarray(sc.wbvh_slot_tri))
    rng = np.random.default_rng(0)
    ro = jax.device_put(jnp.asarray(rng.uniform(-3, 3, (R, 3)).astype(np.float32)))
    rd_np = rng.normal(size=(R, 3)).astype(np.float32)
    rd = jax.device_put(jnp.asarray(rd_np / np.linalg.norm(rd_np, axis=1, keepdims=True)))
    tm = jax.device_put(jnp.full((R,), 1e30, jnp.float32))
    act = jax.device_put(jnp.ones((R,), bool))

    class S:
        pass

    s = S()
    s.wbvh_nodes = nodes_full
    s.wbvh_tri9f = tri9f
    s.wbvh_slot_tri = slot_tri
    g = lambda *a: tw.closest_hit(s, ro, rd)
    t0 = time.perf_counter()
    out = g()
    jax.block_until_ready(out)
    print(f"compile+first {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(3):
        out = g()
    jax.block_until_ready(out)
    warm = (time.perf_counter() - t0) / 3
    print(f"warm {warm * 1e3:.1f} ms ({R / warm / 1e6:.1f} Mrays/s incoherent)")

    jax.profiler.start_trace("/tmp/trav_trace")
    out = g()
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    f = sorted(glob.glob("/tmp/trav_trace/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        data = json.load(fh)
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        if e.get("ph") == "X" and "dur" in e and "while" not in name and "jit" not in name \
                and not name.startswith("$"):
            dur[name] += e["dur"]
            cnt[name] += 1
    print("top ops (total ms x count):")
    for name, d in dur.most_common(15):
        print(f"  {d / 1e3:8.2f} ms x{cnt[name]:<5d} {name[:90]}")


if __name__ == "__main__":
    main()
