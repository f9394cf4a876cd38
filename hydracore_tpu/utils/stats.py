"""Per-stage render statistics — the MRaysStat analogue.

TPU rebuild of the reference timing harness (cglobals.h:1764 MRaysStat,
filled by clFinish-bracketed timers in GPUOCLLayerCore.cpp:16-128 and
printed by RenderDriverRTE::Draw): stage timings are measured by running
separately-jitted stage kernels with block_until_ready fences; throughput
counters (Mrays/s, Msamples/s) come from the integrator's ray counter.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class MRaysStat:
    """Aggregated per-pass statistics (reference field names kept)."""

    raysPerSec: float = 0.0  # Mrays/s, all traversals
    samplesPerSec: float = 0.0  # Msamples/s, full paths
    traversalTimeMs: float = 0.0
    shadowTimeMs: float = 0.0
    shadeTimeMs: float = 0.0  # everything that is not traversal
    samLightTimeMs: float = 0.0
    bounceTimeMs: float = 0.0  # one full bounce
    sampleTimeMs: float = 0.0  # one full sample (all bounces)
    tracePercent: float = 0.0
    passes: int = 0

    def summary(self) -> str:
        return (
            f"[stat] rays/sec({self.raysPerSec:.1f}M) "
            f"samples/sec({self.samplesPerSec:.2f}M) "
            f"trace({self.traversalTimeMs:.1f}ms) shadow({self.shadowTimeMs:.1f}ms) "
            f"shade({self.shadeTimeMs:.1f}ms) sample({self.sampleTimeMs:.1f}ms) "
            f"trace%({self.tracePercent:.0f})"
        )


def profile_pass(scene, n_rays: int = 65536, max_depth: int = 5, seed: int = 777,
                 n_timed: int = 4) -> MRaysStat:
    """Measure stage costs on the current default device."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydracore_tpu.integrators.pt import make_eye_rays, render_pass
    from hydracore_tpu.ops import rng as _rng
    from hydracore_tpu.ops.trace_api import any_hit, closest_hit

    scene = jax.device_put(scene)
    cam = scene.camera
    W, H = cam.width, cam.height
    R = min(n_rays, W * H)
    pix = jnp.arange(R, dtype=jnp.uint32)
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    jitter = _rng.screen_sample(jnp.zeros(R, jnp.uint32), pix)
    lens = jnp.zeros((R, 2), jnp.float32)
    ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)

    def timed(f, *a):
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(n_timed):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n_timed * 1e3

    t_trav = timed(lambda o, d: closest_hit(scene, o, d), ray_o, ray_d)
    t_shadow = timed(lambda o, d: any_hit(scene, o, d, 1e30), ray_o, ray_d)

    pass_fn = lambda i: render_pass(scene, i, jnp.uint32(seed), max_depth=max_depth)[0]
    t_sample = timed(pass_fn, jnp.uint32(1)) * (W * H) / max(W * H, 1)

    _, rays = render_pass(scene, jnp.uint32(0), jnp.uint32(seed), max_depth=max_depth)
    rays = float(rays)

    trav_total = (t_trav + t_shadow) * max_depth * (W * H) / R
    st = MRaysStat(
        raysPerSec=rays / max(t_sample, 1e-9) / 1e3,
        samplesPerSec=(W * H) / max(t_sample, 1e-9) / 1e3,
        traversalTimeMs=t_trav,
        shadowTimeMs=t_shadow,
        shadeTimeMs=max(t_sample - trav_total, 0.0),
        bounceTimeMs=t_sample / max_depth,
        sampleTimeMs=t_sample,
        tracePercent=min(trav_total / max(t_sample, 1e-9), 1.0) * 100.0,
        passes=n_timed,
    )
    return st
