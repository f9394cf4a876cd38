"""Benchmark: render throughput on the cornell+teapot scene (test_224).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Scene choice: the reference's baseline row "cornell" (BASELINE.md) is the
cornell box WITH the 25.6k-triangle teapot. The repo copy of test_42 is
missing the teapot chunk (chunk_00003.vsgf), so the honest equivalent is
test_224 (same box + teapot present). Baseline to beat: 9.1 Msamples/s
(RX 480, 1024x1024, depth 5, full path samples).

Measurement design:
- DIFFERENTIAL timing (round-3 harness): the axon tunnel adds large sticky
  per-call latency; (T(n_hi) - T(n_lo)) / (n_hi - n_lo) inside one process
  cancels it. Each probe runs in a subprocess (independent runtime states,
  shared persistent compile cache).
- UNKILLABLE (round-4 fix; r3 emitted nothing at rc=124): the headline
  runs FIRST on the best-known config; a SIGTERM/SIGALRM handler emits the
  best-so-far JSON, so the driver cutting the window still records a
  result. Extras (tiny/big probes, a small config A/B) only spend
  whatever budget remains (HYDRA_BENCH_BUDGET_S, default 2400 s with the
  alarm at budget - 30 s).
- STATISTICALLY GATED (round-5 fix; the r4 headline under-reported the
  build by ~20% off a single noisy differential at 14% spread): the probe
  keeps taking (lo, hi) differential pairs until the 3 estimates closest
  to the median agree within 5% (up to 6 pairs), and reports the median.
  Extras are sanity-gated: a differential under the per-pass compute
  floor (the r4 "262144 Msamples/s" artifact — dt collapsed to the 1e-9
  clamp) is rejected as a measurement failure, not recorded.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_MSAMPLES = 9.1  # RX 480, cornell(+teapot), 1024^2 (BASELINE.md)

N_LO, N_HI = 1, 5

# best-known config from the round-4 hardware A/B (/tmp/ab_r4.log); the
# empty dict = module defaults. Kept ALSO as the autotune seed so the
# driver's run hits the warm compile cache.
BEST_CFG: dict = {}

_PROBE = r"""
import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from hydracore_tpu.scene.scene import load_scene
from hydracore_tpu.integrators.pt import render_passes
scene_dir, W, n_lo, n_hi, depth = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), 5)
scene = jax.device_put(load_scene(scene_dir, width=W, height=W))
seed = jnp.uint32(777)

def run(n_pass, base):
    fb, rays = render_passes(scene, jnp.uint32(base), seed, n_pass=n_pass,
                             max_depth=depth)
    np.asarray(fb)  # forced host materialization = true completion
    return float(rays)

run(n_lo, 0)   # compile both programs before any timing
run(n_hi, 100)

def timed(n_pass, base):
    t0 = time.perf_counter()
    rays = run(n_pass, base)
    return time.perf_counter() - t0, rays

# median-of->=3 with a 5% agreement gate (round-5): one differential pair
# at 14% spread mis-stated the r4 build by ~20%; keep sampling pairs until
# the 3 estimates nearest the median agree, then report the median.
diffs, rays_hi, base = [], 0.0, 200
for i in range(6):
    t_lo, _ = timed(n_lo, base)
    t_hi, rays_hi = timed(n_hi, base + 50)
    base += 100
    diffs.append((t_hi - t_lo) / (n_hi - n_lo))
    if len(diffs) >= 3:
        med = sorted(diffs)[len(diffs) // 2]
        best3 = sorted(diffs, key=lambda x: abs(x - med))[:3]
        spread = (max(best3) - min(best3)) / max(med, 1e-9)
        if spread < 0.05:
            break
med = sorted(best3)[1]
print("RESULT %.9f %.1f %.3f" % (max(med, 1e-9), rays_hi / n_hi, spread))
"""


def _probe(scene_dir: str, width: int, timeout: float, env=None):
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, scene_dir, str(width), str(N_LO),
         str(N_HI)],
        capture_output=True, text=True, timeout=max(timeout, 60),
        cwd="/root/repo", env=full_env)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            _, dt, rays, spread = line.split()
            return max(float(dt), 1e-6), float(rays), float(spread)
    raise RuntimeError(f"probe failed: {out.stdout[-400:]} {out.stderr[-400:]}")


# MMLT throughput probe (VERDICT r3 #7): differential over mutation passes
# at 512^2 on test_224 -> chain mutations/s (each mutation = one full-path
# SBDPT re-eval per chain; chains = W*H).
_MMLT_PROBE = r"""
import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from hydracore_tpu.scene.scene import load_scene
from hydracore_tpu.integrators.mmlt import render_mmlt
W = 512
scene = jax.device_put(load_scene(
    "/root/reference/hydra_app/tests/test_224", width=W, height=W))
MPP = 16
def run(n):
    render_mmlt(scene, n_passes=n, mutations_per_pass=MPP, seed=777,
                max_depth=5)
run(1)
def timed(n):
    t0 = time.perf_counter(); run(n); return time.perf_counter() - t0
t_lo = timed(1); t_hi = timed(3)
dt = max(t_hi - t_lo, 1e-9)
muts = 2 * MPP * W * W  # pass-count delta x mutations/pass x chains
print("RESULT %.3f" % (muts / dt / 1e6))
"""


def _device_available(timeout: int = 420) -> str | None:
    """Bounded TPU probe (device init hangs forever when the tunnel is
    down; init takes ~2 min when it is up). Returns the device string."""
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; print('DEV|' + str(jax.devices()[0]))"],
            capture_output=True, text=True, timeout=timeout,
            cwd="/root/repo")
        for ln in out.stdout.splitlines():
            if ln.startswith("DEV|"):
                return ln[4:]
        return None
    except Exception:
        return None


def _tag(env):
    return ",".join(f"{k.replace('HYDRA_', '')}={v}"
                    for k, v in env.items()) or "base"


SCENE = "/root/reference/hydra_app/tests/test_224"

_state = {"json": {
    "metric": "Msamples/s cornell+teapot (test_224) 1024x1024 depth5 "
              "PT(MIS+NEE)",
    "value": 0.0, "unit": "Msamples/s", "vs_baseline": 0.0,
    "extra": {"phase": "init"},
}}
_emitted = False


def _emit(signum=None, frame=None):
    global _emitted
    if not _emitted:
        _emitted = True
        print(json.dumps(_state["json"]), flush=True)
    if signum is not None:
        os._exit(0)


def main():
    budget = float(os.environ.get("HYDRA_BENCH_BUDGET_S", "2400"))
    t0 = time.monotonic()
    signal.signal(signal.SIGTERM, _emit)
    signal.signal(signal.SIGALRM, _emit)
    signal.alarm(max(int(budget) - 30, 60))

    def left():
        return budget - (time.monotonic() - t0) - 60

    dev = _device_available()
    if dev is None:
        _state["json"]["extra"] = {
            "error": "TPU device init timed out — axon tunnel down; no "
                     "measurement possible, not a renderer regression"}
        _emit()
        return 0

    # ---- phase 1: the headline, best-known config, FIRST
    extra = _state["json"]["extra"] = {"phase": "headline"}
    try:
        dt1k, rays1k, spread1k = _probe(SCENE, 1024, timeout=left(),
                                        env=BEST_CFG)
        ms = 1024 * 1024 / dt1k / 1e6
        _state["json"].update(value=round(ms, 3),
                              vs_baseline=round(ms / BASELINE_MSAMPLES, 4))
        _state["json"]["spread"] = round(spread1k, 3)
        extra.update({"Mrays/s_1024": round(rays1k / dt1k / 1e6, 2),
                      "repeat_spread_1024": round(spread1k, 3),
                      "config": _tag(BEST_CFG)})
    except Exception as e:
        extra["headline_error"] = str(e)[:300]
        _emit()
        return 0

    # ---- phase 2: extras, strictly budget-gated + sanity-gated: reject a
    # differential under the per-pass compute floor (dt collapsing to the
    # clamp produced the r4 "262144 Msamples/s" artifact) and record the
    # rejection loudly instead of the garbage number.
    extra["phase"] = "extras"
    for key, scene_dir, width in (
            ("tiny_scene_Msamples/s", "/root/reference/hydra_app/tests/test_42",
             1024),
            ("big_scene_256_Msamples/s",
             "/root/reference/hydra_app/tests/Benchmark_Scene03", 256)):
        if left() < 300:
            extra[key] = None
            continue
        try:
            dt, _, spr = _probe(scene_dir, width, timeout=min(left(), 1500),
                                env=BEST_CFG)
            ms_x = width * width / dt / 1e6
            # floor: nothing in this class exceeds 100 Msamples/s/pass
            if dt < width * width / 100e6 or spr > 0.5:
                extra[key] = None
                extra[key + "_rejected"] = f"dt={dt:.2e} spread={spr:.2f}"
            else:
                extra[key] = round(ms_x, 3)
        except Exception:
            extra[key] = None

    # MMLT chain throughput (mutations/s across all per-depth chain groups)
    if left() > 600:
        try:
            out = subprocess.run(
                [sys.executable, "-c", _MMLT_PROBE], capture_output=True,
                text=True, timeout=min(left(), 1500), cwd="/root/repo",
                env=dict(os.environ, **{k: str(v) for k, v in
                                        BEST_CFG.items()}))
            for ln in out.stdout.splitlines():
                if ln.startswith("RESULT"):
                    extra["mmlt_Mmutations/s"] = float(ln.split()[1])
        except Exception:
            extra["mmlt_Mmutations/s"] = None

    # ---- phase 3: a small A/B over alternates; adopt a winner if it beats
    # the headline by > 5% (warm-cache configs only — compiles are the cost)
    # r5 A/B already priced: K=4 1.787, sort-every-2 1.769, f32-permute
    # 1.928, pop-off 1.928-class — all lose to base 2.166. Remaining
    # untested candidates: wider visit groups, fused shadow+extension.
    alts = [c for c in ({"HYDRA_CL_K": "12"}, {"HYDRA_FUSE_TRACE": "1"})
            if c != BEST_CFG]
    scores = {}
    for env in alts:
        if left() < 900:
            break
        try:
            dt, rays, _ = _probe(SCENE, 1024, timeout=min(left(), 1500),
                                 env=env)
            ms = 1024 * 1024 / dt / 1e6
            scores[_tag(env)] = round(ms, 3)
            if ms > _state["json"]["value"] * 1.05:
                _state["json"].update(
                    value=round(ms, 3),
                    vs_baseline=round(ms / BASELINE_MSAMPLES, 4))
                extra.update({"Mrays/s_1024": round(rays / dt / 1e6, 2),
                              "config": _tag(env)})
        except Exception:
            scores[_tag(env)] = None
    if scores:
        extra["alt_configs_Msamples/s"] = scores

    extra["phase"] = "done"
    extra["device"] = dev
    _emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
