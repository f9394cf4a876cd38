"""Triangle clusters: the scene layout for the cluster-dense TPU traversal.

The binary SAH tree (bvh/builder.py) is cut into subtrees of at most
K_TRIS triangles; each cut subtree becomes a *cluster* carrying its tight
AABB and a padded block of 128 triangles. Traversal then needs no tree at
all on-device: rays slab-test ALL cluster AABBs densely (stage A) and run
dense Moller-Trumbore against only the active clusters (stage B) — trading
redundant flops (TPU's strength) for divergence (TPU's weakness). DFS cut
order keeps neighbouring clusters spatially close.

Reference analogue: the leaf layout role of bvh_builder's triangle4v
blocks (bvh_access_dll2.cpp:264 InsertTrainglesInLeaf) — redesigned around
(rays x 128-triangle) VPU tiles instead of 4-wide GPU leaf packets.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from hydracore_tpu.bvh.builder import FlatBVH

K_TRIS = 128  # triangles per cluster (= lane width)


@dataclass
class ClusterSet:
    bounds_lane: np.ndarray  # (8, Cp) f32 rows [bxm bym bzm bxM byM bzM 0 0]
    bounds_sub: np.ndarray   # (Cp, 8) f32 same data, sublane-indexed
    tris: np.ndarray         # (Cp, 12, 128) f32 rows [v0.xyz e1.xyz e2.xyz pad3]
    slot_tri: np.ndarray     # (Cp*128,) i32 padded slot -> tri id (-1 pad)
    num_clusters: int


def cut_clusters(bvh: FlatBVH, tri_v0: np.ndarray, tri_e1: np.ndarray,
                 tri_e2: np.ndarray, k_tris: int = K_TRIS) -> ClusterSet:
    """Cut the binary BVH into clusters of <= k_tris triangles.

    Triangles must already be in BVH leaf order (builder perm applied), so
    every subtree covers one contiguous triangle range."""
    T = tri_v0.shape[0]
    count = bvh.count
    left = bvh.left
    right = bvh.right

    # subtree triangle counts + range starts (iterative post-order)
    n = bvh.num_nodes
    sub_cnt = np.zeros(n, np.int64)
    sub_start = np.zeros(n, np.int64)
    order = []
    stack = [0]
    while stack:
        i = stack.pop()
        order.append(i)
        if count[i] == 0:
            stack.append(left[i])
            stack.append(right[i])
    for i in reversed(order):
        if count[i] > 0:
            sub_cnt[i] = count[i]
            sub_start[i] = left[i]
        else:
            sub_cnt[i] = sub_cnt[left[i]] + sub_cnt[right[i]]
            sub_start[i] = min(sub_start[left[i]], sub_start[right[i]])

    # DFS cut
    ranges: list[tuple[int, int, int]] = []  # (start, cnt, node)
    stack = [0]
    while stack:
        i = stack.pop()
        if sub_cnt[i] <= k_tris or count[i] > 0:
            ranges.append((int(sub_start[i]), int(sub_cnt[i]), i))
        else:
            stack.append(right[i])
            stack.append(left[i])

    C = len(ranges)
    Cp = max((C + 127) // 128 * 128, 128)
    bl = np.zeros((8, Cp), np.float32)
    bl[0:3, :] = 1e30
    bl[3:6, :] = -1e30
    tris = np.zeros((Cp, 12, 128), np.float32)
    tris[:, 0, :] = 1e30  # degenerate padding: v0 far away, e1=e2=0
    slot_tri = np.full(Cp * 128, -1, np.int32)

    for ci, (start, cnt, node) in enumerate(ranges):
        bl[0:3, ci] = bvh.bmin[node]
        bl[3:6, ci] = bvh.bmax[node]
        sl = slice(start, start + cnt)
        tris[ci, 0:3, :cnt] = tri_v0[sl].T
        tris[ci, 3:6, :cnt] = tri_e1[sl].T
        tris[ci, 6:9, :cnt] = tri_e2[sl].T
        slot_tri[ci * 128 : ci * 128 + cnt] = np.arange(start, start + cnt)

    return ClusterSet(bounds_lane=bl, bounds_sub=np.ascontiguousarray(bl.T),
                      tris=tris, slot_tri=slot_tri, num_clusters=C)
