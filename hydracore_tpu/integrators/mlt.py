"""PSSMLT — primary-sample-space Metropolis light transport, batched chains.

TPU rebuild of the reference MLT machinery (GPUOCLLayerAdvanced.cpp
MMLT_Pass:395 / mlt.cl): the reference runs MEGABLOCKSIZE Markov chains in
parallel on the GPU with xVector/yVector primary-sample states, large/small
step proposals (MMLTMakeProposal, mlt.cl:339), accept/reject with weighted
contribution of BOTH states (MMLTAcceptReject, mlt.cl:205) and a burn-in
that estimates the normalization brightness and selects starting states
proportional to contribution (MMLT_BurningIn, SURVEY.md §8.7).

This implementation is the Kelemen-style PSSMLT over the PT path sampler
(the reference's KMLT path, crandom.h MUTATE machinery; its full MMLT adds
per-depth SBDPT chains — planned on top of the same harness):
  * each of R chains holds a primary sample vector u in [0,1)^D driving
    pixel position, lens, and per-bounce BSDF/NEE/RR decisions;
  * proposals: large step (fresh uniform, prob p_large) or small step
    (exponential-scale offsets, wrap-around);
  * both current and proposal splat with Veach weights (1-a) and a;
  * image normalization: mean luminance b estimated from large steps
    (EstimateMLTNormConst analogue, GPUOCLLayer.cpp:1175).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hydracore_tpu.integrators.pt import (
    DG_ALPHA,
    DG_BSDF,
    DG_LIGHT,
    DG_RR,
    make_eye_rays,
    pt_trace_impl,
)
from hydracore_tpu.ops import rng

P_LARGE = 0.3
S1, S2 = 1.0 / 1024.0, 1.0 / 64.0  # small-step mutation scale (Kelemen)


def psv_dims(max_depth: int) -> int:
    # 2 pixel + 2 lens + per-depth (4 bsdf + 4 light + 1 rr + 1 alpha)
    return 4 + 10 * max_depth


def _lum(c):
    return 0.2126 * c[..., 0] + 0.7152 * c[..., 1] + 0.0722 * c[..., 2]


def _trace_from_psv(scene, psv, max_depth: int):
    """Evaluate the path sampler at primary sample vector psv (R, D).
    Returns (color (R,3), pixel_flat (R,) int32)."""
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

    def rand_fn(depth, group):
        base = 4 + 10 * depth
        off = {DG_BSDF: 0, DG_LIGHT: 4, DG_RR: 8, DG_ALPHA: 9}.get(group)
        if off is None:
            # auxiliary dims outside the primary-sample vector (SSS medium
            # events, AO probes): an independent hash stream keyed by lane —
            # not mutated with the chain, matching the reference's use of
            # plain RandomGen for non-PSS dims (mlt.cl rndFloat decode)
            lane = jnp.arange(R, dtype=jnp.uint32)
            return rng.rand4(lane, depth, group, jnp.uint32(0x51ED270))
        w = 4 if group in (DG_BSDF, DG_LIGHT) else 1
        sl = psv[:, base + off : base + off + w]
        if w < 4:
            sl = jnp.concatenate([sl, jnp.zeros((R, 4 - w))], axis=1)
        return sl

    color, _ = pt_trace_impl(scene, ray_o, ray_d, rand_fn, max_depth=max_depth)
    color = jnp.clip(color, 0.0, 1e6)
    return color, py * W + px


def _mutate(u, key_idx, step_idx, seed, p_large=P_LARGE,
            step_power=1024.0, step_size=1.0):
    """Large/small-step proposal for all chains. u: (R, D).

    step_power/step_size are the reference's HRT_MMLT_STEP_SIZE_POWER
    (512 = large, 1024 = normal, 2048 = small) and
    HRT_MMLT_STEP_SIZE_COEFF (>1 shrinks steps) — statefile
    <mmlt_step_power>/<mmlt_step_size> (RenderDriverRTE.cpp:264-282).
    Defaults reproduce the Kelemen (1/1024, 1/64) scales."""
    R, D = u.shape
    base = key_idx * jnp.uint32(0x01000193) ^ jnp.uint32(step_idx)
    r_sel = rng.rand1(base, 0, 11, seed)
    large = r_sel < p_large

    dims = jnp.arange(D, dtype=jnp.uint32)[None, :]
    h = rng.pcg3d(
        jnp.stack(
            [
                jnp.broadcast_to(base[:, None], (R, D)),
                jnp.broadcast_to(dims, (R, D)) + jnp.uint32(0x9E3779B9),
                jnp.broadcast_to(jnp.uint32(seed) ^ jnp.uint32(step_idx) * jnp.uint32(2654435761), (R, D)),
            ],
            axis=-1,
        )
    )
    u1 = (h[..., 0] >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
    u2 = (h[..., 1] >> 8).astype(jnp.float32) * (1.0 / 16777216.0)

    # Kelemen small step: dv = s2 * exp(-log(s2/s1) * u), signed;
    # s1 = 1/step_power, s2 = 16/step_power (ratio fixed at 16 like the
    # default S1/S2), shrunk by the step_size coefficient
    dv = (16.0 / step_power / step_size) * jnp.exp(-np.log(16.0) * u1)
    dv = jnp.where(u2 < 0.5, dv, -dv)
    small = u + dv
    small = small - jnp.floor(small)

    fresh = u1  # reuse as fresh uniforms for large steps (independent hash)
    return jnp.where(large[:, None], fresh, small), large


@partial(jax.jit, static_argnames=("max_depth", "step_power", "step_size"))
def mlt_step(scene, fb, chain_u, chain_f, chain_c, chain_pix, step_idx, seed,
             max_depth: int = 5, step_power: float = 1024.0,
             step_size: float = 1.0):
    """One Metropolis mutation for all chains; splats both states into fb.
    Returns (fb, chain state..., b_acc, b_cnt) — b_* accumulate the
    large-step luminance for the normalization constant."""
    R = chain_u.shape[0]
    key_idx = jnp.arange(R, dtype=jnp.uint32)

    prop_u, large = _mutate(chain_u, key_idx, step_idx, seed,
                            step_power=step_power, step_size=step_size)
    prop_c, prop_pix = _trace_from_psv(scene, prop_u, max_depth)
    prop_f = _lum(prop_c)

    b_acc = jnp.where(large, prop_f, 0.0).sum()
    b_cnt = large.sum().astype(jnp.float32)

    # standard Metropolis ratio; chains start in f>0 states (burn-in
    # resampling), so no forced acceptance from zero states — that would
    # inject non-f-proportional mass into dim regions (measured +30% bias)
    a = jnp.clip(prop_f / jnp.maximum(chain_f, 1e-12), 0.0, 1.0)

    # splat both states (Veach weighting)
    w_old = jnp.where(chain_f > 0, (1.0 - a) / jnp.maximum(chain_f, 1e-12), 0.0)
    w_new = jnp.where(prop_f > 0, a / jnp.maximum(prop_f, 1e-12), 0.0)
    fb = fb.at[chain_pix].add(chain_c * w_old[:, None], mode="drop")
    fb = fb.at[prop_pix].add(prop_c * w_new[:, None], mode="drop")

    # accept/reject (randomness folds the global step index)
    u_acc = rng.rand1(key_idx, step_idx, 13, seed ^ jnp.uint32(0x5BD1E995))
    acc = u_acc < a
    chain_u = jnp.where(acc[:, None], prop_u, chain_u)
    chain_f = jnp.where(acc, prop_f, chain_f)
    chain_c = jnp.where(acc[:, None], prop_c, chain_c)
    chain_pix = jnp.where(acc, prop_pix, chain_pix)

    return fb, chain_u, chain_f, chain_c, chain_pix, b_acc, b_cnt


def render_mlt(scene, n_passes: int, n_chains: int | None = None,
               mutations_per_pass: int = 16, seed: int = 777,
               max_depth: int | None = None, burn_in: int = 8,
               step_power: float | None = None,
               step_size: float | None = None):
    """Metropolis render -> (H, W, 3). Image = splats * b / n_samples where
    b is the mean path luminance from large steps."""
    md = max_depth or scene.settings.trace_depth
    st = getattr(scene, "settings", None)
    sp = float(step_power if step_power is not None
               else getattr(st, "mmlt_step_power", 1024.0))
    sc = float(step_size if step_size is not None
               else getattr(st, "mmlt_step_size", 1.0))
    H, W = scene.camera.height, scene.camera.width
    R = n_chains or (W * H)
    D = psv_dims(md)
    scene = jax.device_put(scene)

    # init chains from uniform samples (burn-in selects live states)
    key = jnp.arange(R, dtype=jnp.uint32)
    dims = jnp.arange(D, dtype=jnp.uint32)[None, :]
    h = rng.pcg3d(
        jnp.stack(
            [
                jnp.broadcast_to(key[:, None], (R, D)),
                jnp.broadcast_to(dims, (R, D)),
                jnp.full((R, D), np.uint32(seed), jnp.uint32),
            ],
            axis=-1,
        )
    )
    chain_u = (h[..., 0] >> 8).astype(jnp.float32) * (1.0 / 16777216.0)
    chain_c, chain_pix = jax.jit(_trace_from_psv, static_argnums=(2,))(scene, chain_u, md)
    chain_f = _lum(chain_c)

    # burn-in state selection proportional to contribution (the reference's
    # MMLTSelectSampleProportionalToContrib, mlt.cl:101): systematic
    # resampling over the initial uniform candidates so every chain starts
    # in the stationary distribution's support
    f_np = np.asarray(chain_f, np.float64)
    if f_np.sum() > 0:
        cdf = np.cumsum(f_np)
        cdf /= cdf[-1]
        # stratified picks from the counter RNG (seed discipline: the same
        # PCG3D stream family as every other random in the renderer)
        lane = jnp.arange(R, dtype=jnp.uint32)
        jit_u = np.asarray(rng.rand1(lane, jnp.uint32(0), 23,
                                     jnp.uint32(seed)), np.float64)
        rs = (np.arange(R, dtype=np.float64) + jit_u) / R
        pick = np.searchsorted(cdf, rs).clip(0, R - 1).astype(np.int32)
        chain_u = chain_u[pick]
        chain_c = chain_c[pick]
        chain_pix = chain_pix[pick]
        chain_f = chain_f[pick]

    fb = jnp.zeros((H * W, 3), jnp.float32)
    b_sum, b_n = 0.0, 0.0
    total_mut = 0
    n_steps = n_passes * mutations_per_pass
    n_burn = burn_in * mutations_per_pass
    for s in range(n_steps):
        fb_in = fb if s >= n_burn else jnp.zeros_like(fb)
        fb_out, chain_u, chain_f, chain_c, chain_pix, ba, bc = mlt_step(
            scene, fb_in, chain_u, chain_f, chain_c, chain_pix,
            jnp.uint32(s), jnp.uint32(seed), md, sp, sc,
        )
        if s >= n_burn:
            fb = fb_out
            total_mut += 1
        b_sum += float(ba)
        b_n += float(bc)

    b = b_sum / max(b_n, 1.0)
    n_samples = total_mut * R
    return np.asarray(fb).reshape(H, W, 3) * (b * W * H / max(n_samples, 1))
