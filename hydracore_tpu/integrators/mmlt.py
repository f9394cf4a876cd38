"""MMLT — Metropolis light transport over the bidirectional (SBDPT) target
with per-depth chain groups.

TPU rebuild of the reference MMLT (GPUOCLLayerAdvanced.cpp:395 MMLT_Pass,
:518 MMLTInitSplitDataUniform, :640 MMLT_BurningIn; mlt.cl:339
MMLTMakeProposal / :205 MMLTAcceptReject / :1472 MMLTConnect; SURVEY §8.7):

  * chains are split by total path length k (vertex count) — the per-depth
    thread allocation of MMLTInitSplitDataUniform, so deep transport gets
    its own stationary distribution and normalization;
  * each chain holds a primary-sample vector driving pixel/lens, the
    camera subpath and the light subpath randoms; a mutation is a Kelemen
    large/small step (MMLTMakeProposal semantics);
  * the target is the MIS-weighted sum of the k-length SBDPT strategies
    (evaluated batched by integrators/bdpt._bdpt_core with k_only=k) —
    every mutation re-traces both subpaths, exactly as MMLT_Pass calls
    EvalSBDPT on the proposal;
  * both current and proposal states splat with Veach (1-a)/a weights
    (MMLTAcceptReject contributes x and y);
  * burn-in: states start from contribution-proportional resampling and
    the per-depth normalization constant b_k is estimated from large-step
    proposals (MMLT_BurningIn's average brightness, per depth — the
    reference's per-depth scale table, GPUOCLLayerAdvanced.cpp:859).

Final image = sum_k  splat_k * b_k * (W*H) / n_samples_k.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.integrators.bdpt import _bdpt_core
from hydracore_tpu.integrators.mlt import _lum, _mutate
from hydracore_tpu.integrators.pt import make_eye_rays
from hydracore_tpu.ops import rng

DG = {"cam": 0, "emit": 1, "lgt": 2}


def psv_dims(k: int) -> int:
    """[2 pixel + 2 lens] + (k-1) camera bounces x4 + emit x4 +
    max(k-2,1) light bounces x4."""
    return 4 + 4 * (k - 1) + 4 + 4 * max(k - 2, 1)


def _contribs_k(scene, psv, k: int, max_depth: int):
    """All k-vertex SBDPT strategy contributions for PSS states psv.

    Returns (list of (flat_pix, color), own_pix)."""
    cam = scene.camera
    W, H = cam.width, cam.height
    R = psv.shape[0]
    fx = psv[:, 0] * W
    fy = psv[:, 1] * H
    px = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, W - 1)
    py = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, H - 1)
    jitter = jnp.stack([fx - px, fy - py], -1)
    lens = psv[:, 2:4]
    ray_o, ray_d = make_eye_rays(cam, px, py, jitter, lens)
    own_pix = py * W + px

    cam_base = 4
    emit_base = cam_base + 4 * (k - 1)
    lgt_base = emit_base + 4

    def rand_fn(depth, group):
        from hydracore_tpu.integrators.bdpt import (DG_BD_BLEND,
                                                    DG_BD_CAM_BSDF,
                                                    DG_BD_LGT_BSDF,
                                                    DG_BD_LGT_EMIT)
        if group == DG_BD_BLEND:
            # blend-walk uniforms sit outside the PSV: an independent
            # lane-keyed hash stream (not mutated with the chain — the
            # reference decodes non-PSS dims from plain RandomGen too)
            lane = jnp.arange(R, dtype=jnp.uint32)
            return rng.rand4(lane, depth, group, jnp.uint32(0x51ED271))
        if group == DG_BD_CAM_BSDF:
            base = cam_base + 4 * depth
        elif group == DG_BD_LGT_EMIT:
            base = emit_base
        else:  # light bsdf at depth j+1 -> slice j
            base = lgt_base + 4 * (depth - 1)
        return psv[:, base:base + 4]

    # n_splat = W*H: a t'=1 (connect-to-eye) strategy splats to a pixel
    # chosen by geometry, not by the PSS pixel dims — its u-integral lacks
    # the 1/(W*H) pixel-selection suppression every own-pixel strategy
    # has, so its contribution (and its density in the MIS walk) must be
    # divided by the screen sample count exactly as in bdpt_pass. With
    # n_splat=1 splat-carried transport (e.g. a bulb in a glass shell)
    # renders W*H times too bright.
    out = _bdpt_core(scene, ray_o, ray_d, rand_fn, own_pix,
                     jnp.float32(W * H), max_depth, "full", k_only=k)
    return out, own_pix


@partial(jax.jit, static_argnames=("k", "max_depth"))
def _eval_state(scene, psv, k: int, max_depth: int):
    """Stacked (pix (R,S), colors (R,S,3), f (R,)) for PSS states."""
    out, _ = _contribs_k(scene, psv, k, max_depth)
    pix = jnp.stack([p for p, _ in out], axis=1)
    col = jnp.stack([c for _, c in out], axis=1)
    f = _lum(col).sum(axis=1)
    return pix, col, f


@partial(jax.jit, static_argnames=("k", "max_depth", "step_power",
                                   "step_size"))
def mmlt_step(scene, fb, u, f, pix_s, col_s, step_idx, seed,
              k: int, max_depth: int, step_power: float = 1024.0,
              step_size: float = 1.0):
    """One mutation for the k-group chains; splats both states into fb.
    Returns (fb, u, f, pix_s, col_s, b_acc, b_cnt)."""
    R = u.shape[0]
    key_idx = jnp.arange(R, dtype=jnp.uint32) + jnp.uint32((k * 0x9E3779B9) & 0xFFFFFFFF)

    prop_u, large = _mutate(u, key_idx, step_idx, seed,
                            step_power=step_power, step_size=step_size)
    p_pix, p_col, p_f = _eval_state(scene, prop_u, k, max_depth)

    b_acc = jnp.where(large, p_f, 0.0).sum()
    b_cnt = large.sum().astype(jnp.float32)

    a = jnp.clip(p_f / jnp.maximum(f, 1e-12), 0.0, 1.0)
    w_old = jnp.where(f > 0, (1.0 - a) / jnp.maximum(f, 1e-12), 0.0)
    w_new = jnp.where(p_f > 0, a / jnp.maximum(p_f, 1e-12), 0.0)
    S = p_col.shape[1]
    fb = fb.at[pix_s.reshape(-1)].add(
        (col_s * w_old[:, None, None]).reshape(R * S, 3), mode="drop")
    fb = fb.at[p_pix.reshape(-1)].add(
        (p_col * w_new[:, None, None]).reshape(R * S, 3), mode="drop")

    u_acc = rng.rand1(key_idx, step_idx, 17, seed ^ jnp.uint32(0x5BD1E995))
    acc = u_acc < a
    u = jnp.where(acc[:, None], prop_u, u)
    f = jnp.where(acc, p_f, f)
    pix_s = jnp.where(acc[:, None], p_pix, pix_s)
    col_s = jnp.where(acc[:, None, None], p_col, col_s)
    return fb, u, f, pix_s, col_s, b_acc, b_cnt


@partial(jax.jit, static_argnames=("k", "max_depth", "n_sub", "step_power",
                                   "step_size"))
def mmlt_steps(scene, fb, u, f, pix_s, col_s, step_base, seed,
               k: int, max_depth: int, n_sub: int,
               step_power: float = 1024.0, step_size: float = 1.0):
    """n_sub mutations in ONE device dispatch (lax.fori_loop over
    mmlt_step's body). The per-depth Python loop of r3 paid one dispatch
    latency PER MUTATION — the documented enemy on this TPU (VERDICT r3
    weak #6); batching mutations amortizes it n_sub-fold, like the
    reference's in-queue kernel chain (MMLT_DoPass inner loop,
    GPUOCLLayerAdvanced.cpp:395-498)."""

    def body(i, st):
        fb, u, f, pix_s, col_s, ba, bn = st
        fb, u, f, pix_s, col_s, ba_i, bn_i = mmlt_step(
            scene, fb, u, f, pix_s, col_s,
            step_base + i.astype(jnp.uint32), seed, k, max_depth,
            step_power, step_size)
        return fb, u, f, pix_s, col_s, ba + ba_i, bn + bn_i

    z = jnp.zeros((), jnp.float32)
    return jax.lax.fori_loop(0, n_sub, body,
                             (fb, u, f, pix_s, col_s, z, z))


def _init_psv(Rk: int, D: int, k: int, seed: int, salt: int = 0):
    """Uniform PSS states from the counter-based RNG (no host entropy)."""
    key = jnp.arange(Rk, dtype=jnp.uint32) + jnp.uint32(salt)
    dims = jnp.arange(D, dtype=jnp.uint32)[None, :]
    h = rng.pcg3d(jnp.stack([
        jnp.broadcast_to(key[:, None], (Rk, D)),
        jnp.broadcast_to(dims, (Rk, D)) + jnp.uint32((k * 977) & 0xFFFFFFFF),
        jnp.full((Rk, D), np.uint32(seed), jnp.uint32)], axis=-1))
    return (h[..., 0] >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


@partial(jax.jit, static_argnames=("Rk", "k"))
def _resample_states(u, f, pix_s, col_s, Rk: int, k: int, seed):
    """Contribution-proportional systematic resampling to Rk chains —
    MMLT_BurningIn's SelectSampleProportionalToContrib
    (GPUOCLLayerAdvanced.cpp:697-760), on device with the counter RNG
    (stratified: one jittered pick per 1/Rk slice of the CDF)."""
    cdf = jnp.cumsum(f)
    total = cdf[-1]
    lane = jnp.arange(Rk, dtype=jnp.uint32)
    jit = rng.rand1(lane, jnp.uint32(k), 23, seed)
    r = (lane.astype(jnp.float32) + jit) / Rk * total
    pick = jnp.clip(jnp.searchsorted(cdf, r), 0, f.shape[0] - 1)
    return u[pick], f[pick], pix_s[pick], col_s[pick]


def _probe_alloc(scene, ks, md, R_total, probe_chains, seed):
    """Probe per-depth brightness b0_k from uniform large-step states and
    allocate chains ∝ b0_k (256-rounded, floor 256, zero-transport depths
    dropped). Returns (alloc {k: chains}, probe states, b0)."""
    probes, b0 = {}, {}
    for k in ks:
        u = _init_psv(probe_chains, psv_dims(k), k, seed)
        pix_s, col_s, f = _eval_state(scene, u, k, md)
        probes[k] = (u, f, pix_s, col_s)
        b0[k] = float(jnp.sum(f))
    w_total = sum(b0.values())
    if w_total <= 0.0:
        return {}, probes, b0
    alloc = {}
    for k in ks:
        if b0[k] <= 0.0:
            continue  # no transport at this depth
        share = int(R_total * b0[k] / w_total)
        alloc[k] = max(256, (share + 255) // 256 * 256)
    return alloc, probes, b0


def probe_depth_alloc(scene, n_chains: int, seed: int = 777,
                      max_depth: int | None = None, k_min: int = 2,
                      probe_chains: int = 2048):
    """Public view of the per-depth chain allocation (the reference's
    MMLTInitSplitDataUniform + contribution scale table,
    GPUOCLLayerAdvanced.cpp:518,859) — for tests and diagnostics."""
    md = max_depth or scene.settings.trace_depth
    scene = jax.device_put(scene)
    alloc, _, _ = _probe_alloc(scene, list(range(k_min, md + 2)), md,
                               n_chains, probe_chains, seed)
    return alloc


def render_mmlt(scene, n_passes: int, n_chains: int | None = None,
                mutations_per_pass: int = 16, seed: int = 777,
                max_depth: int | None = None, burn_in: int | None = None,
                k_min: int = 2, probe_chains: int = 2048,
                step_power: float | None = None,
                step_size: float | None = None):
    """Multiplexed-style Metropolis over SBDPT -> (H, W, 3)."""
    md = max_depth or scene.settings.trace_depth
    st = getattr(scene, "settings", None)
    sp = float(step_power if step_power is not None
               else getattr(st, "mmlt_step_power", 1024.0))
    sc = float(step_size if step_size is not None
               else getattr(st, "mmlt_step_size", 1.0))
    # <mmlt_burn_iters> (default 1024, RenderDriverRTE.cpp:246-249) counts
    # UNIFORM-SAMPLE burn rounds: the reference's MMLT_BurningIn runs
    # BURN_ITERS iterations of MEGABLOCK fresh uniform evaluations,
    # averaging brightness over all of them and selecting
    # contribution-proportional initial states (GPUOCLLayerAdvanced.cpp:
    # 199-300) — it discards NO post-selection Markov steps. We keep the
    # shape (burn rounds of uniform probes -> pooled b estimate ->
    # proportional resampling) with probe_chains-wide rounds, capped by
    # MMLT_BURN_ROUNDS_CAP for interactive use (the reference burns
    # 1024 x 256k evaluations; cap 16 x 2048 by default).
    MMLT_BURN_ROUNDS_CAP = int(__import__("os").environ.get(
        "HYDRA_MMLT_BURN_ROUNDS", "16"))
    if burn_in is None:
        burn_in = int(getattr(st, "mmlt_burn_iters", 1024))
    burn_rounds = max(1, min(int(burn_in), MMLT_BURN_ROUNDS_CAP))
    H, W = scene.camera.height, scene.camera.width
    ks = list(range(k_min, md + 2))  # path vertex counts
    R_total = n_chains or (W * H)
    scene = jax.device_put(scene)

    img = np.zeros((H * W, 3), np.float64)
    n_steps = n_passes * mutations_per_pass

    # ---- burn-in rounds: per-depth brightness b0_k from uniform states +
    # the pooled resampling source; round 0 also drives the per-depth chain
    # allocation (MMLTInitSplitDataUniform + contribution table,
    # GPUOCLLayerAdvanced.cpp:518,859).
    alloc, probes, b0 = _probe_alloc(scene, ks, md, R_total, probe_chains,
                                     seed)
    if not alloc:
        return img.reshape(H, W, 3).astype(np.float32)
    b_pool = {k: [probes[k]] for k in alloc}
    for rnd in range(1, burn_rounds):
        for k in alloc:
            u = _init_psv(probe_chains, psv_dims(k), k, seed,
                          salt=(0x9E3779B9 * rnd) & 0xFFFFFFFF)
            pix_s, col_s, f = _eval_state(scene, u, k, md)
            b_pool[k].append((u, f, pix_s, col_s))
            b0[k] += float(jnp.sum(f))

    for k, Rk in alloc.items():
        u = jnp.concatenate([p[0] for p in b_pool[k]])
        f = jnp.concatenate([p[1] for p in b_pool[k]])
        pix_s = jnp.concatenate([p[2] for p in b_pool[k]])
        col_s = jnp.concatenate([p[3] for p in b_pool[k]])
        u, f, pix_s, col_s = _resample_states(
            u, f, pix_s, col_s, Rk, k,
            jnp.uint32((seed ^ 0xA511E9B3) & 0xFFFFFFFF))

        fb = jnp.zeros((H * W, 3), jnp.float32)
        # burn-round uniforms already sampled b_k's estimator
        b_sum = b0[k]
        b_n = float(probe_chains * burn_rounds)
        total_mut = 0
        # one dispatch per pass: mutations_per_pass mutations ride a
        # lax.fori_loop (mmlt_steps) instead of one dispatch each
        for s0 in range(0, n_steps, mutations_per_pass):
            n_sub = min(mutations_per_pass, n_steps - s0)
            fb, u, f, pix_s, col_s, ba, bc = mmlt_steps(
                scene, fb, u, f, pix_s, col_s, jnp.uint32(s0),
                jnp.uint32((seed + 131 * k) & 0xFFFFFFFF),
                k, md, n_sub, sp, sc)
            total_mut += n_sub
            b_sum += float(ba)
            b_n += float(bc)

        b_k = b_sum / max(b_n, 1.0)
        n_samples = total_mut * Rk
        img += np.asarray(fb, np.float64) * (b_k * W * H / max(n_samples, 1))

    return img.reshape(H, W, 3).astype(np.float32)
