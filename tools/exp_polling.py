"""Experiment: characterize the tunnel's slow-polling contamination.

Times the SAME render_passes dispatch (tiny scene, fast program) in four
in-process states to pick a bench.py design:
  1. right after the compile+first-run warmup (r02 bench state — was 8000x off)
  2. after a burst of 200 trivial tiny dispatches (poll-interval reset probe)
  3. again immediately (steady?)
  4. after a long 512^2 dispatch (re-poisoned?) then a tiny burst
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from hydracore_tpu.integrators.pt import render_passes
from hydracore_tpu.scene.scene import load_scene


def timed(label, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f"{label:44s}: {dt*1e3:10.1f} ms", flush=True)
    return dt


def tiny_burst(n=200):
    x = jnp.ones((8, 128), jnp.float32)
    for i in range(n):
        x = (x + 1.0)
        x.block_until_ready()


def main():
    sc_tiny = jax.device_put(load_scene("/root/reference/hydra_app/tests/test_42",
                                        width=1024, height=1024))
    seed = jnp.uint32(777)

    # warmup: compile (possibly remote-compile, slow) + first run
    timed("warmup (compile+run) tiny 1024^2 x8", lambda: render_passes(
        sc_tiny, jnp.uint32(0), seed, n_pass=8, max_depth=5))

    timed("state1: immediately after warmup", lambda: render_passes(
        sc_tiny, jnp.uint32(8), seed, n_pass=8, max_depth=5))

    tiny_burst()
    timed("state2: after 200-tiny-dispatch burst", lambda: render_passes(
        sc_tiny, jnp.uint32(16), seed, n_pass=8, max_depth=5))

    timed("state3: immediately again", lambda: render_passes(
        sc_tiny, jnp.uint32(24), seed, n_pass=8, max_depth=5))
    timed("state3b: immediately again", lambda: render_passes(
        sc_tiny, jnp.uint32(32), seed, n_pass=8, max_depth=5))

    sc_big = jax.device_put(load_scene("/root/reference/hydra_app/tests/test_224",
                                       width=512, height=512))
    timed("poison: 512^2 test_224 x8 (compile+run)", lambda: render_passes(
        sc_big, jnp.uint32(0), seed, n_pass=8, max_depth=5))
    timed("state4: tiny right after poison", lambda: render_passes(
        sc_tiny, jnp.uint32(40), seed, n_pass=8, max_depth=5))
    tiny_burst()
    timed("state5: tiny after poison+burst", lambda: render_passes(
        sc_tiny, jnp.uint32(48), seed, n_pass=8, max_depth=5))
    timed("state6: big again (steady)", lambda: render_passes(
        sc_big, jnp.uint32(8), seed, n_pass=8, max_depth=5))
    tiny_burst()
    timed("state7: big after burst", lambda: render_passes(
        sc_big, jnp.uint32(16), seed, n_pass=8, max_depth=5))


if __name__ == "__main__":
    main()
