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
    """Measure stage costs on the current default device.

    DIFFERENTIAL timing throughout (bench.py design): each probe runs the
    op N_LO and N_HI times INSIDE one dispatch (chained so XLA cannot CSE
    the repeats) and reports (T_hi - T_lo)/(N_hi - N_lo) — per-call tunnel
    latency, which is large and sticky on this TPU, cancels exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hydracore_tpu.integrators.pt import make_eye_rays, render_passes
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

    N_LO, N_HI = 2, 6

    @jax.jit
    def trav_n(o, d, n):
        def body(i, st):
            o_, d_ = st
            t, tri, u, v = closest_hit(scene, o_, d_)
            t_ = jnp.where(jnp.isfinite(t), t, 0.0)
            return o_ + (t_ * 1e-7)[:, None] * d_, d_

        return jax.lax.fori_loop(0, n, body, (o, d))[0]

    @jax.jit
    def shadow_n(o, d, n):
        def body(i, st):
            o_, acc = st
            occ = any_hit(scene, o_, d, 1e30)
            return o_ + jnp.where(occ, 1e-7, 0.0)[:, None] * d, acc + occ.sum()

        return jax.lax.fori_loop(0, n, body, (o, jnp.zeros((), jnp.int32)))[1]

    reps = max(n_timed // 2, 1)  # differential repetitions per rep count

    def diff_time(run):
        """run(n) executes the op n times in one dispatch; ms per op."""
        run(N_LO)
        run(N_HI)  # compile both before timing
        ts = {N_LO: 0.0, N_HI: 0.0}
        for _ in range(reps):
            for n in (N_LO, N_HI):
                t0 = time.perf_counter()
                run(n)
                ts[n] += time.perf_counter() - t0
        return (ts[N_HI] - ts[N_LO]) / (reps * (N_HI - N_LO)) * 1e3

    t_trav = diff_time(lambda n: np.asarray(trav_n(ray_o, ray_d, n)))
    t_shadow = diff_time(lambda n: np.asarray(shadow_n(ray_o, ray_d, n)))

    def run_pass(n):
        fb, _ = render_passes(scene, jnp.uint32(100), jnp.uint32(seed),
                              n_pass=n, max_depth=max_depth)
        np.asarray(fb)

    t_sample = diff_time(run_pass)

    _, rays = render_passes(scene, jnp.uint32(0), jnp.uint32(seed), n_pass=1,
                            max_depth=max_depth)
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
        passes=reps,
    )
    return st
