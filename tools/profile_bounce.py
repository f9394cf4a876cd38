"""Dev tool: per-stage timing of ONE PT bounce's components on test_224.

Each stage runs N_REP times inside one jitted lax.scan (data-dependent
chain so XLA cannot CSE) — the only honest way to time sub-ms stages
through the multi-ms dispatch tunnel (see docs/ROUND2_NOTES.md).
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from hydracore_tpu.bsdf import core as bsdf
from hydracore_tpu.integrators import pt
from hydracore_tpu.lights import sampling as lsamp
from hydracore_tpu.lights.envmap import env_pdf_for_dir
from hydracore_tpu.ops import rng, trace_api
from hydracore_tpu.scene.scene import load_scene

N_REP = 32


def scan_time(label, fn, *args):
    """fn(perturbed_first_arg, *rest) -> arbitrary pytree."""

    @jax.jit
    def run(a0, *rest):
        def body(carry, _):
            a = a0 + carry if jnp.issubdtype(a0.dtype, jnp.floating) else a0
            out = fn(a, *rest)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(out))
            return s * 0.0, s

        _, ss = jax.lax.scan(body, jnp.float32(0.0), None, length=N_REP)
        return ss[-1]

    out = run(*args)
    np.asarray(out)
    t0 = time.perf_counter()
    out = run(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / N_REP
    print(f"{label:28s}: {dt*1e3:8.3f} ms")
    return dt


def main():
    scene_dir = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/hydra_app/tests/test_224"
    W = H = 512
    sc = jax.device_put(load_scene(scene_dir, width=W, height=H))
    R = W * H
    pix = jnp.asarray(pt._morton_pixel_order(W, H))
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, px, py, jit2, jit2)
    ro, rd = jax.device_put((ro, rd))
    t, tri, u, v = jax.jit(lambda o, d: trace_api.closest_hit(sc, o, d))(ro, rd)
    pos, n, ng, uv, mat_id, tri_light, tang = jax.jit(
        lambda: pt.compute_hit(sc, tri, u, v, ro, rd, t))()
    jax.block_until_ready((pos, mat_id))
    feats = bsdf.scene_feats(sc)
    sample_idx = pix * jnp.uint32(0x9E3779B9)

    # stage: RNG (4 groups like one bounce uses)
    scan_time("rng rand4 x4", lambda si: [rng.rand4(si.astype(jnp.uint32), 1, g, jnp.uint32(7)) for g in range(4)],
              sample_idx.astype(jnp.int32))

    # stage: sort + gather + inverse-scatter (the coherence machinery)
    def sortgather(o, d):
        key = trace_api.ray_sort_key(sc, o, d)
        _, idx = jax.lax.sort_key_val(key, jnp.arange(R, dtype=jnp.int32))
        os, ds = o[idx], d[idx]
        inv = jnp.zeros(R, jnp.int32).at[idx].set(jnp.arange(R, dtype=jnp.int32))
        return os[inv], ds[inv]

    scan_time("sort+gather+invscatter", sortgather, ro, rd)

    # stage: compute_hit (attribute gathers)
    scan_time("compute_hit gathers", lambda tt: pt.compute_hit(sc, tri, u, v, ro, rd, tt), t)

    # stage: fetch_material (incl. texture fetch)
    p = bsdf.fetch_material(sc, mat_id, uv, pos, n, wo=-rd)
    scan_time("fetch_material", lambda uvx: bsdf.fetch_material(sc, mat_id, uvx, pos, n, wo=-rd), uv)

    # stage: apply_bump
    scan_time("apply_bump", lambda nn: bsdf.apply_bump(sc, p, nn, tang, uv), n)

    # stage: env radiance + pdf
    scan_time("env radiance+pdf", lambda d: (lsamp.env_radiance(sc, d),
                                             env_pdf_for_dir(sc.env_rows_cdf, sc.env_cols_cdf,
                                                             sc.env_pdf_uv, d)), rd)

    # stage: light select + sample + eval_pdf_from_hit
    r_l = rng.rand4(sample_idx, 1, 2, jnp.uint32(7))

    def light_stage(posx):
        l_idx, pick = lsamp.select_light(sc.lights, r_l[:, 3])
        ls = lsamp.sample_light_rev(sc, l_idx, r_l[:, :3], posx)
        lrow = jnp.clip(tri_light, 0, sc.lights.ltype.shape[0] - 1)
        lp = lsamp.light_eval_pdf_from_hit(sc, lrow, ro, rd, posx, n)
        return ls.dir, ls.pdf_w, lp, pick

    scan_time("light sample+pdf", light_stage, pos)

    # stage: eval_bsdf
    wi = jax.device_put(normalize(np.random.default_rng(0).normal(size=(R, 3)).astype(np.float32)))
    scan_time("eval_bsdf", lambda w: bsdf.eval_bsdf(p, w, wi, n, feats), -rd)

    # stage: sample_bsdf
    r_b = rng.rand4(sample_idx, 1, 1, jnp.uint32(7))
    scan_time("sample_bsdf(+eval)", lambda w: bsdf.sample_bsdf(p, w, n, r_b, feats), -rd)

    # stage: full shadow trace path (sorted any-hit)
    sdir = jax.device_put(normalize(np.array([[0.2, 0.9, 0.1]], np.float32) +
                                    0.05 * np.random.default_rng(1).normal(size=(R, 3)).astype(np.float32)))
    dist = jnp.full((R,), 2.0, jnp.float32)

    def shadow(o):
        return trace_api.any_hit_sorted(sc, o, sdir, dist, active=jnp.ones(R, bool))

    scan_time("anyhit_sorted shadow", shadow, pos)

    def closest_s(o):
        return trace_api.closest_hit_sorted(sc, o, wi, active=jnp.ones(R, bool))

    scan_time("closest_sorted bounce", closest_s, pos)


def normalize(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


if __name__ == "__main__":
    main()
