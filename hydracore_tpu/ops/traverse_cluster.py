"""Cluster-dense traversal — the TPU performance path.

Ideas on top of the cluster layout (bvh/clusters.py):

  A. slab-test the 256-ray block against ALL cluster AABBs as (256, 128)
     VPU pair-tiles. Bounds are pre-permuted per direction octant so lane
     order IS front-to-back order for the block's rays. Two tiny MXU
     matmuls turn the (rays x clusters) hit mask into 16-bit occupancy
     words the scalar core can read back cheaply (24 scalar VMEM reads
     instead of one per cluster — dynamic scalar VMEM loads cost ~40
     cycles each and dominated the v1 kernel).
  B. compact active positions into an SMEM list (bit-scan over the
     words), then visit clusters with a dense 256x128 Moller-Trumbore,
     folding per-ray best-t with two lane reductions.
  C. every K_VISITS visits, re-run stage A against the *current* per-ray
     t and re-compact the unvisited tail: once the front clusters have
     resolved the block's hits, everything behind the surface drops out
     and the loop terminates — the dense analogue of ordered-DFS early
     termination. Any-hit folds occlusion into t (occluded rays get
     t = -BIG) so the same refilter retires them.

Coherence (= small per-block AABB unions) comes from Morton-ordered
primary pixels and integrator-side ray sorting.

Reference analogue: ctrace.h BVH4 traversal / trace.cl kernels — this is
a ground-up TPU redesign, not a port: no stacks, no per-ray divergence,
all arithmetic full-width VPU tiles + MXU occupancy matmuls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os_env

# rays per block: the coherence unit the slab stage prunes for. Smaller
# blocks see fewer clusters each (fewer wasted dense-MT tests on
# incoherent bounces — measured sub/blk dense-work ratio at 32-ray
# granularity is 0.27 on bounce-1 wavefronts, tools/
# exp_subgroup_divergence.py) at the price of more scalar compactions and
# stage sweeps. Tunable PER WAVEFRONT KIND: bounce wavefronts are far
# less coherent than primary/shadow ones, so they get their own knob.
R_BLK = int(_os_env.environ.get("HYDRA_CL_RBLK", "256"))
# bounce default 128: hardware A/B (r4, test_224 @1024^2) — 1.730 vs
# 1.541 Msamples/s at 256; 64 loses again (1.463). /tmp/ab_r4b.log.
R_BLK_BOUNCE = int(_os_env.environ.get("HYDRA_CL_RBLK_BOUNCE",
                                       "128" if R_BLK == 256 else str(R_BLK)))
R_BLK_SHADOW = int(_os_env.environ.get("HYDRA_CL_RBLK_SHADOW", str(R_BLK)))


def _rblk_for(kind: str) -> int:
    return {"bounce": R_BLK_BOUNCE, "shadow": R_BLK_SHADOW}.get(kind, R_BLK)
BIG = 3.0e38
# visits between refilters. Smaller K refilters sooner (fewer wasted
# visits once the front clusters resolve the block) at the cost of more
# refilter sweeps — a hardware A/B knob (r5 @1024^2: K=4 1.787 vs K=8
# 2.166 Msamples/s — extra refilters don't pay at this scene scale).
# Shadow wavefronts get their own knob: any-hit lanes retire at the first
# occluder, so earlier refilters can pay off sooner than for closest-hit.
K_VISITS = int(_os_env.environ.get("HYDRA_CL_K", "8"))
K_VISITS_SHADOW = int(_os_env.environ.get("HYDRA_CL_K_SHADOW",
                                          str(K_VISITS)))


def _kvis_for(kind: str) -> int:
    return K_VISITS_SHADOW if kind == "shadow" else K_VISITS
# refilter flavor: "cheap" prunes with slab ENTRY distances cached at the
# initial sweep (per 32-ray subgroup min-tn vs the subgroup's current max
# t) — two tiny matmuls instead of re-running the 6-plane slab stage, so
# early termination costs ~0.2us instead of ~1.5us per refilter. It keeps
# strictly more clusters than a full re-sweep (subgroup-granular, entry
# distance vs exact interval) but never drops a needed one: cluster c is
# needed iff some ray r has tn(r,c) < t(r), which implies
# min_tn[subgroup(r), c] < max_t[subgroup(r)].
# Hardware A/B (r4, test_224 @1024^2): cheap 1.240 vs full 1.541
# Msamples/s — the weaker pruning costs far more in extra visits than the
# refilter sweep it saves. Default stays "full"; the cheap machinery is
# kept behind the env knob for re-testing on other scene shapes.
REFILTER = _os_env.environ.get("HYDRA_CL_REFILTER", "full")
N_SUB = 8  # tn-cache subgroups per ray block

# visit-list construction flavor (HYDRA_CL_POP, default on): build and
# REBUILD the front-to-back visit list by popping the lowest set bit of
# SMEM-cached occupancy words (~8 scalar ops per surviving entry, one
# while loop per sweep). The r4 machinery instead re-SCANNED O(Cp) per
# sweep: a 16-iteration bit loop per nonzero word at init (cbody) plus one
# ~40-cycle cnt VMEM read PER remaining list entry at every refilter
# (rbody) — several us of scalar work per live block that the
# front-to-back bit order makes unnecessary (bit position IS visit order).
# Hardware A/B (r5, test_224 @1024^2 d5): pop 2.166 vs list 1.928
# Msamples/s with the bf16 permute fixed, ~+12% independently at 256^2.
POP_ITER = _os_env.environ.get("HYDRA_CL_POP", "1") == "1"

# NOTE (r5): subgroup-masked visits (HYDRA_CL_SUBG_*) were built in r4 and
# DELETED here after the hardware A/B lost decisively: 1.504 (SUBG=32,
# RBLK 256) / 1.342 (bounce+shadow) vs 1.735 Msamples/s base on test_224
# @1024^2 d5 — per-cluster pl.when row-slice branches serialize on the
# scalar core and break the dense pipeline, costing more than the skipped
# MT work they save (the CPU-model bound of 0.27x dense work,
# tools/exp_subgroup_divergence.py, does not survive contact with Mosaic).
#
# NOTE (r5): the HBM-streaming "big mode" (pool in ANY memory + K-deep DMA
# prefetch ring per visit group) was likewise DELETED after its hardware
# A/B lost to the partitioned chunk chain on the same Benchmark_Scene03
# wavefront: big 0.7 / VMEM-at-scale 0.8 vs partitioned 1.2 Mrays/s
# (tools/exp_partition.py; r4-gated per VERDICT, decision closed r5).
# Any-size scenes route through partition_clusters + _partitioned_traverse.


def _make_kernel(Cp: int, any_hit_mode: bool, unroll_sub: bool = False,
                 inst_mode: bool = False,
                 r_blk: int = 256, k_vis: int = K_VISITS):
    CT = Cp // 128
    NW = CT * 8  # 16-bit occupancy words
    R_BLK = r_blk  # shadow the module default inside the kernel closure
    M_SUB = max(1024 // R_BLK, 1)

    cheap = REFILTER == "cheap"

    def kernel(ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref, *rest):
        if inst_mode:
            map_ref, imat_ref = rest[0], rest[1]
            rest = rest[2:]
        else:
            map_ref = imat_ref = None
        if POP_ITER:
            out_ref, outi_ref, cnt, lst, aw, vis, *rest = rest
        else:
            out_ref, outi_ref, cnt, lst, *rest = rest
            aw = vis = None
        tnm = rest[0] if cheap else None
        if unroll_sub:  # interpret mode: fori over ref effects miscompiles
            for m in range(M_SUB):
                _process_block(jnp.int32(m), ray_ref, cblo_ref, tris_ref,
                               perm_ref, oct_ref, map_ref, imat_ref,
                               out_ref, outi_ref, cnt, lst, aw, vis, tnm)
            return

        def process(m, _carry):
            _process_block(m, ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
                           map_ref, imat_ref, out_ref, outi_ref, cnt, lst,
                           aw, vis, tnm)
            return 0

        jax.lax.fori_loop(0, M_SUB, process, 0)

    def _process_block(m, ray_ref, cblo_ref, tris_ref, perm_ref, oct_ref,
                       map_ref, imat_ref, out_ref, outi_ref, cnt, lst,
                       aw, vis, tnm):
        rays = ray_ref[m]  # (R_BLK, 8) [ox oy oz dx dy dz tlim act]
        ox = rays[:, 0:1]
        oy = rays[:, 1:2]
        oz = rays[:, 2:3]
        dx = rays[:, 3:4]
        dy = rays[:, 4:5]
        dz = rays[:, 5:6]
        t_lim = rays[:, 6:7]
        act = rays[:, 7:8] > 0.0

        eps = jnp.float32(1e-12)
        ix = 1.0 / jnp.where(jnp.abs(dx) < eps, jnp.where(dx < 0, -eps, eps), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < eps, jnp.where(dy < 0, -eps, eps), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < eps, jnp.where(dz < 0, -eps, eps), dz)
        oxix = ox * ix
        oyiy = oy * iy
        oziz = oz * iz

        oct_ = oct_ref[pl.program_id(0) * M_SUB + m]

        ones_col = jnp.ones((R_BLK, 1), jnp.float32)
        # word-packing matrix: P[j, c] = 2^(c & 15) where c >> 4 == j
        lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        packm = jnp.where((lanes >> 4) == rows8,
                          (1 << (lanes & 15)).astype(jnp.float32), 0.0)

        GS = R_BLK // N_SUB  # rays per tn-cache subgroup

        def stage_a(t_act, save_tn=False):
            """16-bit occupancy words (in front-to-back lane order) of
            clusters whose slab interval beats some ray's t_act. With
            save_tn, also caches per-subgroup min entry distance for the
            cheap refilter."""
            for ct in range(CT):
                s = ct * 128
                bxm = cblo_ref[oct_, 0:1, s:s + 128]
                bym = cblo_ref[oct_, 1:2, s:s + 128]
                bzm = cblo_ref[oct_, 2:3, s:s + 128]
                bxM = cblo_ref[oct_, 3:4, s:s + 128]
                byM = cblo_ref[oct_, 4:5, s:s + 128]
                bzM = cblo_ref[oct_, 5:6, s:s + 128]
                tx0 = bxm * ix - oxix
                tx1 = bxM * ix - oxix
                ty0 = bym * iy - oyiy
                ty1 = byM * iy - oyiy
                tz0 = bzm * iz - oziz
                tz1 = bzM * iz - oziz
                tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                             jnp.minimum(ty0, ty1)),
                                 jnp.minimum(tz0, tz1))
                tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                             jnp.maximum(ty0, ty1)),
                                 jnp.maximum(tz0, tz1))
                hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < t_act)  # (R, 128)
                if save_tn:
                    tn_m = jnp.where(hit, jnp.maximum(tn, 0.0),
                                     jnp.float32(BIG))
                    for g in range(N_SUB):
                        tnm[ct * N_SUB + g:ct * N_SUB + g + 1, :] = jnp.min(
                            tn_m[g * GS:(g + 1) * GS, :], axis=0,
                            keepdims=True)
                c = jax.lax.dot_general(
                    hit.astype(jnp.float32), ones_col,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, 1)
                flags = (c > 0.0).astype(jnp.float32)
                words = jax.lax.dot_general(
                    packm, flags, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (8, 1)
                cnt[ct * 8:ct * 8 + 8, 0:1] = words.astype(jnp.int32)

        ones_sub = jnp.ones((N_SUB, 1), jnp.float32)

        def refilter_cheap(t_cur):
            """Rebuild occupancy words from the cached entry distances:
            keep cluster c iff some subgroup still has min_tn[g, c] below
            its current max t (conservative superset of a full re-sweep)."""
            tmax = jnp.concatenate(
                [jnp.max(t_cur[g * GS:(g + 1) * GS, 0:1], axis=0,
                         keepdims=True) for g in range(N_SUB)],
                axis=0)  # (N_SUB, 1)
            for ct in range(CT):
                tn_g = tnm[ct * N_SUB:(ct + 1) * N_SUB, :]  # (N_SUB, 128)
                flags = (tn_g < tmax).astype(jnp.float32)
                col = jax.lax.dot_general(
                    flags, ones_sub, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (128, 1)
                words = jax.lax.dot_general(
                    packm, (col > 0.0).astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (8, 1)
                cnt[ct * 8:ct * 8 + 8, 0:1] = words.astype(jnp.int32)

        # closest-hit caps t at t_lim so inactive rays never match; any-hit
        # folds occlusion in by dropping t to -BIG once a ray is occluded
        t0 = jnp.where(act, jnp.minimum(t_lim, jnp.float32(BIG)),
                       jnp.float32(-BIG))

        # all-dead blocks (sorted wavefronts pack dead lanes into whole
        # blocks) skip the slab sweep + compaction entirely: ~6 us floor
        # -> ~1 us, a real win at late bounces where most lanes are dead
        any_act = jnp.max(rays[:, 7]) > 0.0

        if POP_ITER:
            # ---- pop-built visit list: copy the sweep's occupancy words
            # into SMEM once (NW dynamic VMEM reads — the same count the
            # r4 scan paid), then build/rebuild the front-to-back list by
            # popping the lowest set bit per entry (~8 scalar ops) in ONE
            # while loop. Kills the 16-iteration bit scan per word at init
            # (cbody) and the ~40-cycle cnt VMEM read per surviving entry
            # at every refilter (rbody). Visited bits are marked at VISIT
            # time and ANDed out of refiltered words; refilter sweeps are
            # monotone subsets of the initial sweep (t only decreases), so
            # rebuild = exactly the surviving tail, in the same order —
            # bit-identical to the r4 list machinery. (A per-visit pop
            # variant with a word-cursor while loop per pop blew Mosaic
            # compile time past 20 min; one rebuild loop per sweep keeps
            # the r4 control-flow shape.)
            def _load_words(first: bool):
                for w in range(NW):
                    word = cnt[w, 0]
                    if first:
                        aw[w] = word
                        vis[w] = 0
                    else:
                        aw[w] = word & (~vis[w])

            def _rebuild(m0):
                """Pop every remaining bit of aw into lst[m0:], front to
                back; leaves the new list length in lst[Cp]."""
                def body(s):
                    w, m = s
                    word = aw[w]
                    nz = word != 0

                    @pl.when(nz)
                    def _(w=w, m=m, word=word):
                        low = word & (0 - word)
                        aw[w] = word - low
                        # bit index of the isolated bit, branchless over
                        # its 4 index bits (no SCALAR bitcast in Mosaic —
                        # the f32 exponent trick only lowers for vectors)
                        b = ((low & 0xAAAA) != 0).astype(jnp.int32) \
                            + 2 * ((low & 0xCCCC) != 0).astype(jnp.int32) \
                            + 4 * ((low & 0xF0F0) != 0).astype(jnp.int32) \
                            + 8 * ((low & 0xFF00) != 0).astype(jnp.int32)
                        lst[m] = w * 16 + b

                    return jnp.where(nz, w, w + 1), m + nz.astype(jnp.int32)

                _, m_e = jax.lax.while_loop(lambda s: s[0] < NW, body,
                                            (jnp.int32(0), m0))
                lst[Cp] = m_e

            @pl.when(any_act)
            def _():
                stage_a(t0, save_tn=cheap)
                _load_words(True)
                _rebuild(jnp.int32(0))

            @pl.when(jnp.logical_not(any_act))
            def _():
                lst[Cp] = jnp.int32(0)

            n0 = lst[Cp]
        else:
            # ---- initial compaction: bit-scan words into the SMEM list ----
            def cbody(w, n):
                word = cnt[w, 0]

                @pl.when(word != 0)
                def _():
                    def bbody(b, m):
                        bit = (word >> b) & 1

                        @pl.when(bit != 0)
                        def _(m=m, b=b):
                            lst[m] = w * 16 + b

                        return m + bit

                    lst[Cp] = jax.lax.fori_loop(0, 16, bbody, n)

                @pl.when(word == 0)
                def _():
                    lst[Cp] = n

                return lst[Cp]

            @pl.when(any_act)
            def _():
                stage_a(t0, save_tn=cheap)
                jax.lax.fori_loop(0, NW, cbody, jnp.int32(0))

            @pl.when(jnp.logical_not(any_act))
            def _():
                lst[Cp] = jnp.int32(0)

            n0 = lst[Cp]


        # ---- visit loop with periodic refilter ----
        lane_u = jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
        big = jnp.float32(BIG)

        def _mt_block(blk, t_cur):
            """Dense MT over one Woop block -> per-ray packed min-t (R,1).

            The Woop transform runs as VPU broadcast FMAs, not MXU matmuls:
            at (R,4)x(4,384) the f32 MXU path costs ~1.6 us/visit while 7
            broadcast FMAs on (R,384) tiles cost ~0.8 us (measured,
            tools/exp_visit_stats.py). The winning LANE rides in the low 7
            mantissa bits of t (positive-float bit order == value order), so
            ONE lane reduction replaces the min + eq-select + max pair; the
            exact t is recomputed in the epilogue's gathered MT."""
            _ox, _oy, _oz, _dx, _dy, _dz = ox, oy, oz, dx, dy, dz
            bx = blk[0:1]  # (1, 384) broadcast rows
            by = blk[1:2]
            bz = blk[2:3]
            bc = blk[3:4]
            os_ = _ox * bx + _oy * by + _oz * bz + bc  # (R, 384) [ou|ov|ow]
            ds_ = _dx * bx + _dy * by + _dz * bz
            ow = os_[:, 256:384]
            dw = ds_[:, 256:384]
            t = -ow / dw  # +-inf/nan on parallel rays -> comparisons fail
            u = os_[:, 0:128] + t * ds_[:, 0:128]
            v = os_[:, 128:256] + t * ds_[:, 128:256]
            hit = (t > 1e-5) & (t < t_cur) & (u >= 0) & (v >= 0) \
                & (u + v <= 1.0)
            tm = jnp.where(hit, t, big)
            tp = jax.lax.bitcast_convert_type(
                (jax.lax.bitcast_convert_type(tm, jnp.uint32)
                 & jnp.uint32(0xFFFFFF80)) | lane_u, jnp.float32)
            return jnp.min(tp, axis=1, keepdims=True)  # (R, 1) packed

        def visit_tm(pos, t_cur):
            """One cluster visit -> (packed min-t, cluster id)."""
            c = perm_ref[oct_, pos]  # true cluster id (SMEM, cheap)
            if inst_mode:
                # instance-cluster: c names an INSTANCED cluster; its Woop
                # block lives in the shared per-mesh pool and the ray is
                # moved into mesh-local space by folding A^T (the affine
                # inverse instance transform, bvh/instanced.py) into the
                # Woop operands: [o_w 1] @ (A^T blk) == [o_l 1] @ blk. t
                # stays the world ray parameter (directions unnormalized).
                blk = tris_ref[map_ref[0, c]]
                At = imat_ref[map_ref[1, c]]  # (4, 4)
                blk = jax.lax.dot_general(
                    At, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                blk = tris_ref[c]  # (4, 384): Woop lane-concat [Mu|Mv|Mw]
            return _mt_block(blk, t_cur), c

        s0 = jnp.full((R_BLK, 1), -1, jnp.int32)

        def _slot_of(tp, c):
            """(packed t, cluster) -> global slot id."""
            lane = (jax.lax.bitcast_convert_type(tp, jnp.uint32)
                    & jnp.uint32(0x7F)).astype(jnp.int32)
            return c * 128 + lane

        def outer_body_pop(st):
            ptr, n, t_cur, slot = st
            # one UNROLLED group of k_vis list reads (clamped re-visits are
            # idempotent under the min-fold); mark the group visited so the
            # next rebuild excludes it
            last = jnp.maximum(n - 1, 0)
            poss = [lst[jnp.minimum(ptr + k, last)] for k in range(k_vis)]
            for p_ in poss:
                vis[p_ >> 4] = vis[p_ >> 4] | jnp.left_shift(
                    jnp.int32(1), p_ & 15)
            def visit_k(k, t_cur):
                return visit_tm(poss[k], t_cur)

            tg, cg = visit_k(0, t_cur)
            sg = jnp.broadcast_to(jnp.int32(cg), (R_BLK, 1))
            for k in range(1, k_vis):
                tk, ck = visit_k(k, t_cur)
                bet = tk < tg
                sg = jnp.where(bet, ck, sg)
                tg = jnp.where(bet, tk, tg)
            better = (tg < t_cur) & (tg < jnp.float32(BIG * 0.5))
            t_cur = jnp.where(better, tg, t_cur)
            slot = jnp.where(better, _slot_of(tg, sg), slot)
            if any_hit_mode:
                t_cur = jnp.where(slot >= 0, jnp.float32(-BIG), t_cur)
            ptr = jnp.minimum(ptr + k_vis, n)

            @pl.when(ptr < n)
            def _():
                if cheap:
                    refilter_cheap(t_cur)
                else:
                    stage_a(t_cur)
                _load_words(False)
                _rebuild(ptr)

            @pl.when(ptr >= n)
            def _():
                lst[Cp] = n

            return ptr, lst[Cp], t_cur, slot

        def outer_body(st):
            ptr, n, t_cur, slot = st
            # one UNROLLED group of k_vis independent visits; positions
            # past the list end clamp to the last valid entry (idempotent
            # re-visit — min-folding makes redundant visits harmless)
            last = jnp.maximum(n - 1, 0)
            def visit_k(k, t_cur):
                return visit_tm(lst[jnp.minimum(ptr + k, last)], t_cur)

            tg, cg = visit_k(0, t_cur)
            sg = jnp.broadcast_to(jnp.int32(cg), (R_BLK, 1))
            for k in range(1, k_vis):
                tk, ck = visit_k(k, t_cur)
                bet = tk < tg
                sg = jnp.where(bet, ck, sg)
                tg = jnp.where(bet, tk, tg)
            # packed(BIG) compares < BIG (lane bits rounded down), so a
            # miss guard keeps no-hit visits from claiming the slot
            better = (tg < t_cur) & (tg < jnp.float32(BIG * 0.5))
            t_cur = jnp.where(better, tg, t_cur)
            slot = jnp.where(better, _slot_of(tg, sg), slot)
            if any_hit_mode:
                # occluded rays retire: refilter sees them as dead lanes
                t_cur = jnp.where(slot >= 0, jnp.float32(-BIG), t_cur)
            ptr = jnp.minimum(ptr + k_vis, n)

            @pl.when(ptr < n)
            def _():
                if cheap:
                    refilter_cheap(t_cur)
                else:
                    stage_a(t_cur)

                def rbody(j, m):
                    pos = lst[j]
                    bit = (cnt[pos >> 4, 0] >> (pos & 15)) & 1

                    @pl.when(bit != 0)
                    def _(m=m, pos=pos):
                        lst[m] = pos

                    return m + bit

                lst[Cp] = jax.lax.fori_loop(ptr, n, rbody, ptr)

            @pl.when(ptr >= n)
            def _():
                lst[Cp] = n

            return ptr, lst[Cp], t_cur, slot

        nvis_end, _, t_best, slot = jax.lax.while_loop(
            lambda st: st[0] < st[1],
            outer_body_pop if POP_ITER else outer_body,
            (jnp.int32(0), n0, t0, s0))

        # column stores (8-way lane concats cost relayouts)
        out_ref[m, :, 0:1] = t_best
        outi_ref[m, :, 0:1] = slot
        # diagnostics: visits performed + initial actives / 1024
        out_ref[m, :, 1:2] = jnp.broadcast_to(
            nvis_end.astype(jnp.float32) + n0.astype(jnp.float32) / 1024.0,
            (R_BLK, 1))

    return kernel


# Flip in tests: routes the kernel through the Pallas interpreter on CPU.
INTERPRET = False


import os as _os  # noqa: E402


@partial(jax.jit, static_argnames=("any_hit_mode", "interpret", "r_blk",
                                   "k_vis"))
def _cluster_traverse(rays, cbl_oct, tris, perm, cl_map=None, inst_woop=None,
                      any_hit_mode=False, interpret=False, r_blk=None,
                      k_vis=K_VISITS):
    """rays: (G, r_blk, 8). Returns (t (G,r_blk), slot (G,r_blk), diag).
    cl_map/inst_woop non-None => instanced mode (bvh/instanced.py layout)."""
    R_BLK = r_blk if r_blk is not None else rays.shape[1]
    assert rays.shape[1] == R_BLK
    M_SUB = max(1024 // R_BLK, 1)
    G = rays.shape[0]
    assert G % M_SUB == 0, "pad ray blocks to a multiple of M_SUB"
    Cp = cbl_oct.shape[2]
    inst = cl_map is not None
    d0 = rays[:, 0, 3:6]  # block octant from its first ray's direction
    oct_ = ((d0[:, 0] > 0).astype(jnp.int32)
            + 2 * (d0[:, 1] > 0).astype(jnp.int32)
            + 4 * (d0[:, 2] > 0).astype(jnp.int32))
    NW = max(Cp // 16, 8)
    scratch = [
        pltpu.VMEM((NW, 8), jnp.int32),
        pltpu.SMEM((Cp + 16,), jnp.int32),
    ]
    if POP_ITER:
        scratch += [
            pltpu.SMEM((NW,), jnp.int32),  # active words (SMEM copy)
            pltpu.SMEM((NW,), jnp.int32),  # visited-bit mask
        ]
    if REFILTER == "cheap":
        # per-subgroup min slab entry distance, cached by the init sweep
        scratch += [pltpu.VMEM(((Cp // 128) * N_SUB, 128), jnp.float32)]
    inst_in = []
    inst_specs = []
    if inst:
        inst_in = [cl_map, inst_woop]
        inst_specs = [
            pl.BlockSpec(cl_map.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(inst_woop.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    out, outi = pl.pallas_call(
        _make_kernel(Cp, any_hit_mode, unroll_sub=interpret,
                     inst_mode=inst, r_blk=R_BLK, k_vis=k_vis),
        interpret=interpret,
        grid=(G // M_SUB,),
        in_specs=[
            pl.BlockSpec((M_SUB, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cbl_oct.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(perm.shape, lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G,), lambda i: (0,), memory_space=pltpu.SMEM),
        ] + inst_specs,
        out_specs=[
            pl.BlockSpec((M_SUB, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M_SUB, R_BLK, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.float32),
            jax.ShapeDtypeStruct((G, R_BLK, 8), jnp.int32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(rays, cbl_oct, tris, perm, oct_, *inst_in)
    return out[:, :, 0], outi[:, :, 0], out[:, :, 1]


def _to_blocks(ro, rd, t_max, active, r_blk=None):
    R_BLK = r_blk if r_blk is not None else globals()["R_BLK"]
    M_SUB = max(1024 // R_BLK, 1)
    R = ro.shape[0]
    step = R_BLK * M_SUB
    Rp = (R + step - 1) // step * step
    tm = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))
    ac = jnp.ones(R, bool) if active is None else active
    r = jnp.zeros((Rp, 8), jnp.float32)
    r = r.at[:R, 0:3].set(ro)
    r = r.at[:R, 3:6].set(rd)
    r = r.at[:R, 6].set(tm)
    r = r.at[:R, 7].set(ac.astype(jnp.float32))
    return r.reshape(Rp // R_BLK, R_BLK, 8), R


def _scene_inst(scene):
    """Instanced-layout arrays or (None, None); instanced scenes run the
    inst_mode kernel variant (and interpret mode off-TPU, where the Mosaic
    kernel cannot lower natively — instancing has no XLA fallback)."""
    cl_map = getattr(scene, "cl_map", None)
    if cl_map is None:
        return None, None, False
    interp = INTERPRET or jax.default_backend() not in ("tpu", "axon")
    return cl_map, scene.inst_woop, interp


def local_rays(scene, inst, ray_o, ray_d):
    """Per-ray transform into instance-local space: one (R,32) inst_attr
    row gather + vector FMAs (rows [12:24) hold invM 3x4 row-major)."""
    im = scene.inst_attr[jnp.clip(inst, 0, scene.inst_attr.shape[0] - 1)]
    ro = jnp.stack([
        im[:, 12] * ray_o[:, 0] + im[:, 13] * ray_o[:, 1]
        + im[:, 14] * ray_o[:, 2] + im[:, 15],
        im[:, 16] * ray_o[:, 0] + im[:, 17] * ray_o[:, 1]
        + im[:, 18] * ray_o[:, 2] + im[:, 19],
        im[:, 20] * ray_o[:, 0] + im[:, 21] * ray_o[:, 1]
        + im[:, 22] * ray_o[:, 2] + im[:, 23]], axis=1)
    rd = jnp.stack([
        im[:, 12] * ray_d[:, 0] + im[:, 13] * ray_d[:, 1]
        + im[:, 14] * ray_d[:, 2],
        im[:, 16] * ray_d[:, 0] + im[:, 17] * ray_d[:, 1]
        + im[:, 18] * ray_d[:, 2],
        im[:, 20] * ray_d[:, 0] + im[:, 21] * ray_d[:, 1]
        + im[:, 22] * ray_d[:, 2]], axis=1)
    return ro, rd


def _is_partitioned(scene) -> bool:
    """Stacked (P, Cpp, 4, 384) cluster pool (bvh/clusters.py
    partition_clusters) — the big-scene multi-chunk layout."""
    return scene.cl_tris.ndim == 4


def _partitioned_traverse(scene, rays, pool, any_hit_mode, interp,
                          r_blk=None, k_vis=K_VISITS):
    """Chain the VMEM kernel over the partition chunks (the reference's
    multi-tree bounce loop, GPUOCLKernels.cpp:424-512). Closest-hit
    threads each chunk's best t into the next chunk's per-ray t_lim so
    later chunks prune against earlier hits; any-hit retires occluded
    lanes between chunks. Slots come back partition-offset
    (p*Cpp*128 + local), matching the flat slot_tri table.

    Per-chunk ray culling (r5): chunks follow the DFS cut order, so each
    is spatially local — before launching chunk p, rays that cannot hit
    its AABB inside their current t cap go inactive; whole ray blocks
    that miss the chunk then take the kernel's all-dead early-out (~1 us
    instead of a full slab sweep + visit loop). The t-threading makes the
    cull tighter chunk over chunk."""
    P, Cpp = pool.shape[0], pool.shape[1]
    neg = jnp.float32(-BIG * 0.5)
    # chunk AABBs from the partitioned lane bounds; padded lanes are 1e30
    # point boxes and are masked out of the union
    bl = scene.cl_bounds  # (P, 8, cap)
    lane_ok = bl[:, 0, :] < 1e29
    inf_ = jnp.float32(1e30)
    cmin = jnp.min(jnp.where(lane_ok[:, None, :], bl[:, 0:3, :], inf_), 2)
    cmax = jnp.max(jnp.where(lane_ok[:, None, :], bl[:, 3:6, :], -inf_), 2)
    ro = rays[:, :, 0:3]
    rd = rays[:, :, 3:6]
    eps = jnp.float32(1e-12)
    inv = 1.0 / jnp.where(jnp.abs(rd) < eps,
                          jnp.where(rd < 0, -eps, eps), rd)
    t_best = None
    slot = None
    for p in range(P):
        ta = (cmin[p] - ro) * inv  # (G, R_BLK, 3)
        tb = (cmax[p] - ro) * inv
        tn = jnp.max(jnp.minimum(ta, tb), axis=2)
        tf = jnp.min(jnp.maximum(ta, tb), axis=2)
        can = (tf >= jnp.maximum(tn, 0.0)) & (tn < rays[:, :, 6])
        rays_p = rays.at[:, :, 7].set(
            jnp.where(can, rays[:, :, 7], 0.0))
        t_p, s_p, _ = _cluster_traverse(rays_p, scene.cl_bounds_oct[p],
                                        pool[p], scene.cl_oct_perm[p],
                                        None, None,
                                        any_hit_mode=any_hit_mode,
                                        interpret=interp, r_blk=r_blk,
                                        k_vis=k_vis)
        s_p = jnp.where(s_p >= 0, s_p + p * Cpp * 128, -1)
        if slot is None:
            t_best, slot = t_p, s_p
        else:
            better = s_p >= 0  # the kernel only records beats of t_lim
            t_best = jnp.where(better, t_p, t_best)
            slot = jnp.where(better, s_p, slot)
        if p + 1 < P:
            if any_hit_mode:  # occluded lanes go inactive for later chunks
                rays = rays.at[:, :, 7].set(
                    jnp.where(slot >= 0, 0.0, rays[:, :, 7]))
            else:  # hit t (== old t_lim on miss) is the new cull distance
                rays = rays.at[:, :, 6].set(
                    jnp.where(t_best > neg, t_best, rays[:, :, 6]))
    return t_best, slot


def closest_hit(scene, ray_o, ray_d, t_max=1e30, active=None,
                kind="primary"):
    """Returns (t, tri_id, u, v); t = +inf on miss (trace_api contract).
    Instanced scenes return the SLOT id in place of tri_id (still <0 on
    miss); compute_hit resolves slot -> (mesh tri, instance) through
    cl_slot_tri2 — the same gather, CSE'd. kind selects the per-wavefront
    ray-block size (bounce wavefronts are less coherent)."""
    r_blk = _rblk_for(kind)
    k_vis = _kvis_for(kind)
    rays, R = _to_blocks(ray_o, ray_d, t_max, active, r_blk)
    cl_map, iwoop, interp = _scene_inst(scene)
    if _is_partitioned(scene):
        interp = INTERPRET or jax.default_backend() not in ("tpu", "axon")
        t, slot = _partitioned_traverse(scene, rays, scene.cl_tris,
                                        any_hit_mode=False, interp=interp,
                                        r_blk=r_blk, k_vis=k_vis)
    else:
        t, slot, _ = _cluster_traverse(rays, scene.cl_bounds_oct,
                                       scene.cl_tris,
                                       scene.cl_oct_perm, cl_map, iwoop,
                                       any_hit_mode=False,
                                       interpret=interp or INTERPRET,
                                       r_blk=r_blk, k_vis=k_vis)
    t = t.reshape(-1)[:R]
    slot = slot.reshape(-1)[:R]
    hit = slot >= 0
    # slot->tri via the 2-wide table (scalar (S,) gathers are ~2x slower
    # than row gathers on this TPU, tools/exp_gather.py)
    row = scene.cl_slot_tri2[jnp.clip(slot, 0, scene.cl_slot_tri2.shape[0] - 1)]
    tri = jnp.where(hit, row[:, 0], -1)
    # u, v recomputed outside the kernel: one gathered MT per ray is far
    # cheaper than carrying 2 extra lane reductions through every visit.
    # v0/e1/e2 come from the packed tri_attr row — the SAME gather
    # compute_hit issues, so XLA CSEs the two into one.
    tid = jnp.clip(tri, 0, scene.tri_attr.shape[0] - 1)
    a = scene.tri_attr[tid]
    v0, e1, e2 = a[:, 0:3], a[:, 3:6], a[:, 6:9]
    if cl_map is not None:  # MT runs in mesh-local space
        o_mt, d = local_rays(scene, row[:, 1], ray_o, ray_d)
    else:
        o_mt, d = ray_o, ray_d
    # exact (t, u, v) from one gathered MT (the kernel's t carries the
    # winning lane in its low mantissa bits — ordering-exact,
    # value-rounded); -double_rt refines in f64 (intersect.mt_refine)
    from hydracore_tpu.ops.intersect import mt_refine, want_double

    t_e, u, v = mt_refine(o_mt, d, v0, e1, e2, f64=want_double(scene))
    t = jnp.where(hit, t_e, jnp.inf)
    tri_out = jnp.where(hit, slot, -1) if cl_map is not None else tri
    return t, tri_out, jnp.where(hit, u, 0.0), jnp.where(hit, v, 0.0)


def any_hit(scene, ray_o, ray_d, t_max, active=None, opaque_only=False):
    """Shadow traversal: True where occluded. opaque_only=True runs over
    the shadow pool (soft/alpha lanes degenerated at build — see
    scene._build_shadow_split), so alpha surfaces never occlude here."""
    r_blk = _rblk_for("shadow")
    k_vis = _kvis_for("shadow")
    rays, R = _to_blocks(ray_o, ray_d, t_max, active, r_blk)
    cl_map, iwoop, interp = _scene_inst(scene)
    pool = scene.cl_tris_shadow if opaque_only else scene.cl_tris
    if _is_partitioned(scene):
        interp = INTERPRET or jax.default_backend() not in ("tpu", "axon")
        _, slot = _partitioned_traverse(scene, rays, pool,
                                        any_hit_mode=True, interp=interp,
                                        r_blk=r_blk, k_vis=k_vis)
    else:
        _, slot, _ = _cluster_traverse(rays, scene.cl_bounds_oct, pool,
                                       scene.cl_oct_perm, cl_map, iwoop,
                                       any_hit_mode=True,
                                       interpret=interp or INTERPRET,
                                       r_blk=r_blk, k_vis=k_vis)
    return slot.reshape(-1)[:R] >= 0
