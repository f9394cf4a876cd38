"""Dev experiment (CPU, numpy): how much dense-visit work would per-SUBGROUP
traversal save over per-BLOCK traversal?

For a sorted bounce-1 wavefront on test_224, compute for every 256-ray block
the slab-test cluster list (what the kernel visits today: union over the
block) vs the union restricted to each 32-ray subgroup. Today's visit work
per block ~ |union| * 256 rays; subgroup-independent visits would cost
~ sum_g |list_g| * 32. The ratio bounds the achievable dense-work cut
(ignoring early-t termination, which helps both equally).

Usage: python tools/exp_subgroup_divergence.py [W]
"""
from __future__ import annotations

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from hydracore_tpu.bsdf import core as bsdf
from hydracore_tpu.integrators import pt
from hydracore_tpu.ops import rng, trace_api
from hydracore_tpu.ops import traverse_wide
from hydracore_tpu.scene.scene import load_scene

W = int(sys.argv[1]) if len(sys.argv) > 1 else 256
R_BLK, GS = 256, 32


def slab_lists(ro, rd, sc, t_lim=None):
    """(R,) rays -> per-ray boolean (R, C) slab-hit matrix (numpy)."""
    bo = np.asarray(sc.cl_bounds_oct)  # (8, 8, Cp) permuted per octant
    perm = np.asarray(sc.cl_oct_perm)  # (8, Cp)
    # un-permute octant 0 into true cluster order
    C = bo.shape[2]
    inv = np.empty(C, np.int64)
    inv[perm[0]] = np.arange(C)
    b = bo[0][:, inv]  # rows: [xm ym zm xM yM zM ...]
    o = np.asarray(ro)[:, :, None]
    d = np.asarray(rd)
    eps = 1e-12
    invd = 1.0 / np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)
    invd = invd[:, :, None]
    t0 = (b[0:3][None] - o) * invd
    t1 = (b[3:6][None] - o) * invd
    tn = np.minimum(t0, t1).max(axis=1)
    tf = np.maximum(t0, t1).min(axis=1)
    lim = np.inf if t_lim is None else np.asarray(t_lim)[:, None]
    return (tf >= np.maximum(tn, 0.0)) & (tn < lim)


def analyze(tag, ro, rd, alive, sc, t_lim=None, r_blk=R_BLK):
    R = ro.shape[0]
    key = trace_api.ray_sort_key(sc, jnp.asarray(ro), jnp.asarray(rd))
    key = jnp.where(jnp.asarray(alive), key, jnp.uint32(0xFFFFFFFF))
    idx = np.asarray(jnp.argsort(key))
    ro, rd, alive = np.asarray(ro)[idx], np.asarray(rd)[idx], np.asarray(alive)[idx]
    tl = None if t_lim is None else np.asarray(t_lim)[idx]
    hit = slab_lists(ro, rd, sc, tl)
    hit[~alive] = False
    nb = R // r_blk
    hit = hit[: nb * r_blk].reshape(nb, r_blk, -1)
    blk_union = hit.any(axis=1)  # (nb, C)
    work_blk = blk_union.sum(axis=1) * r_blk
    live = hit.any(axis=(1, 2))
    per_ray = hit.sum(axis=(1, 2))  # exact per-ray lists * 1 ray
    msg = (f"{tag:10s} blk={r_blk:3d}: blocks={live.sum():5d} "
           f"union/blk={blk_union.sum(axis=1)[live].mean():6.1f} ")
    for gs in (32, 16, 8):
        sub = hit.reshape(nb, r_blk // gs, gs, -1).any(axis=2)
        work_sub = sub.sum(axis=(1, 2)) * gs
        # lockstep per-subgroup visits: every subgroup advances through its
        # OWN list but the block steps together -> steps = max_g |list_g|,
        # each step still full-width r_blk dense work
        work_lock = sub.sum(axis=2).max(axis=1) * r_blk
        msg += (f"g{gs}[sub={work_sub[live].sum() / max(work_blk[live].sum(), 1):.3f} "
                f"lock={work_lock[live].sum() / max(work_blk[live].sum(), 1):.3f}] ")
    msg += f"perray={per_ray[live].mean() / max(work_blk[live].mean(), 1):.3f}"
    print(msg)


def main():
    scene_dir = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/hydra_app/tests/test_224"
    sc = load_scene(scene_dir, width=W, height=W)
    print(f"Cp={sc.cl_tris.shape[0]} tris={sc.tri_attr.shape[0]} W={W}")
    R = W * W
    pix = jnp.asarray(pt._morton_pixel_order(W, W))
    px = (pix % W).astype(jnp.int32)
    py = (pix // W).astype(jnp.int32)
    jit2 = jnp.full((R, 2), 0.5, jnp.float32)
    ro, rd = pt.make_eye_rays(sc.camera, px, py, jit2, jit2)
    alive0 = np.ones(R, bool)
    analyze("primary", ro, rd, alive0, sc)

    scj = jax.device_put(sc)
    t, tri, u, v = traverse_wide.closest_hit(scj, ro, rd)
    pos, n, ng, uv, mat_id, tri_light, tang = pt.compute_hit(
        scj, tri, u, v, ro, rd, t)
    r_b = rng.rand4(pix, 1, 1, jnp.uint32(7))
    p = bsdf.fetch_material(scj, mat_id, uv, pos, n, wo=-rd)
    bs = bsdf.sample_bsdf(p, -rd, n, r_b, bsdf.scene_feats(scj))
    alive = np.asarray(tri >= 0)
    o2 = pt.offs_ray_pos(pos, ng, bs.wi)
    for rb in (256, 128, 64):
        analyze("bounce1", o2, bs.wi, alive, sc, r_blk=rb)

    # shadow wavefront: rays toward one light sample
    from hydracore_tpu.lights.sampling import sample_light_rev, select_light
    r_l = rng.rand4(pix, 1, 2, jnp.uint32(7))
    li, _pick = select_light(scj.lights, r_l[:, 3])
    ls = sample_light_rev(scj, li, r_l[:, :3], pos)
    so = pt.offs_ray_pos(pos, ng, ls.dir)
    analyze("shadow1", so, ls.dir, alive, sc,
            t_lim=np.asarray(ls.dist) * 0.995)


if __name__ == "__main__":
    main()
