"""Texture storage: one flat device buffer + id->record table.

TPU-native analogue of the reference's texture IMemoryStorage
(hydra_drv/MemoryStorageOCL.*, RenderDriverRTE.cpp:753-834): every texture's
texels live in ONE float32 (X, 4) buffer; a small (num_tex, 4) int32 table
holds [texel_offset, width, height, flags]. Kernels fetch by dynamic gather
(ops/texture.py) — no hardware samplers on TPU.

Deviations from the reference, by design:
 - LDR textures are linearized (input gamma 2.2) at LOAD time instead of at
   fetch (SWTexSampler carries per-sampler gamma, cfetch.h:108-131); keeps
   the fetch kernel branchless.

Memory budgeting: fit_texture_res mirrors FitTextureRes
(RenderDriverRTE.cpp:565-650 + AllocAll :604): when the packed heap would
exceed the budget, the heaviest texture is halved (box filter, ≤3 times
each = mip 4) until common + bump pools fit their budgets.
"""
from __future__ import annotations

import os
import struct

import numpy as np

from hydracore_tpu.scene.statefile import SceneDesc

FLAG_LDR = 1


def _load_image4ub(data: bytes) -> np.ndarray:
    w, h = struct.unpack_from("<ii", data, 0)
    px = np.frombuffer(data, np.uint8, count=w * h * 4, offset=8)
    return px.reshape(h, w, 4).astype(np.float32) / 255.0


def _load_image4f(data: bytes) -> np.ndarray:
    w, h = struct.unpack_from("<ii", data, 0)
    px = np.frombuffer(data, np.float32, count=w * h * 4, offset=8)
    return px.reshape(h, w, 4)


def load_texture_array(desc: SceneDesc, tid: int) -> np.ndarray | None:
    t = desc.textures.get(tid)
    if t is None or not t.loc:
        return None
    if getattr(t, "proc_name", None):
        return None  # procedural: loc points at the .c SOURCE, not texels
    path = os.path.join(desc.lib_dir, t.loc)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        data = f.read()
    if t.loc.endswith("image4f"):
        return _load_image4f(data)
    # LDR stays raw: per-sampler input gamma is applied at fetch
    # (SWTexSampler.gamma, cfetch.h:108-131)
    return _load_image4ub(data)


# tex_table flags (SWTexSampler flags analogue)
TEX_CLAMP_U = 1
TEX_CLAMP_V = 2

# default texture heap budgets, bytes of f32 RGBA texels (AllocAll's
# memForTex/memForTex2 defaults, RenderDriverRTE.cpp:604-650). 1 GiB common
# + 256 MiB bump at 16 B/texel = 64M + 16M texels.
TEX_MEM_BUDGET = 1 << 30
TEX_MEM_BUDGET_BUMP = 256 << 20
_BYTES_PER_TEXEL = 16  # float32 RGBA

# quad-heap cap: above this many texels the 4x duplicated bilinear layout
# is skipped and samplers fall back to the 4-corner gather (HBM economy)
QUAD_HEAP_MAX_TEXELS = int(os.environ.get("HYDRA_QUAD_MAX_TEXELS",
                                          str(8 << 20)))


def build_quad_heap(texels: np.ndarray, table: np.ndarray) -> np.ndarray:
    """(X, 16) bilinear-quad heap: row i of texture t at texel (x, y) holds
    the 2x2 footprint [c(x,y) | c(xn,y) | c(x,yn) | c(xn,yn)] with the
    neighbor indices xn/yn PRE-WRAPPED under that texture's own clamp/wrap
    flags. One (R,16) gather then replaces the (4R,4) 4-corner gather —
    gather cost on this TPU is ~1 row/cycle regardless of width
    (tools/exp_layout.py), so bilinear drops to 1/4 of its gather rows.
    4x memory; gated by QUAD_HEAP_MAX_TEXELS at the finalize site."""
    X = texels.shape[0]
    quad = np.zeros((X, 16), np.float32)
    for off, w, h, flags in np.asarray(table, np.int64):
        if w <= 0 or h <= 0:
            continue
        img = texels[off:off + w * h].reshape(h, w, 4)
        xs = np.arange(w)
        ys = np.arange(h)
        xn = np.minimum(xs + 1, w - 1) if (flags & TEX_CLAMP_U) \
            else (xs + 1) % w
        yn = np.minimum(ys + 1, h - 1) if (flags & TEX_CLAMP_V) \
            else (ys + 1) % h
        q = np.concatenate([img, img[:, xn], img[yn], img[yn][:, xn]],
                           axis=2)
        quad[off:off + w * h] = q.reshape(h * w, 16)
    return quad


def downscale2x(img: np.ndarray) -> np.ndarray:
    """Half-resolution box filter (the reference's texture resize step)."""
    h, w = img.shape[:2]
    h2, w2 = max(h // 2, 1), max(w // 2, 1)
    img = img[: h2 * 2, : w2 * 2]
    if h >= 2 and w >= 2:
        return 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                       + img[0::2, 1::2] + img[1::2, 1::2])
    return img[:h2, :w2]


def fit_texture_res(imgs: dict, is_bump: dict,
                    budget: int = TEX_MEM_BUDGET,
                    budget_bump: int = TEX_MEM_BUDGET_BUMP) -> dict:
    """FitTextureRes (RenderDriverRTE.cpp:565): iteratively halve the
    HEAVIEST texture of the over-budget pool (≤3 halvings each — max mip
    level 4) until both pools fit. imgs: {tid: ndarray}; is_bump: {tid:
    bool}. Returns possibly-downscaled {tid: ndarray} and logs resizes."""
    halved: dict[int, int] = {t: 0 for t in imgs}

    def pool_bytes(bump: bool) -> int:
        return sum(im.shape[0] * im.shape[1] * _BYTES_PER_TEXEL
                   for t, im in imgs.items() if is_bump.get(t, False) == bump)

    def heaviest(bump: bool) -> int:
        best, best_sz = -1, 0
        for t, im in imgs.items():
            if is_bump.get(t, False) != bump or halved[t] >= 3:
                continue
            sz = im.shape[0] * im.shape[1]
            if sz > best_sz and min(im.shape[:2]) >= 2:
                best, best_sz = t, sz
        return best

    for bump, cap in ((False, budget), (True, budget_bump)):
        while pool_bytes(bump) > cap:
            t = heaviest(bump)
            if t < 0:
                break
            h, w = imgs[t].shape[:2]
            imgs[t] = downscale2x(imgs[t])
            halved[t] += 1
            print(f"[scene] texture {t} downscaled {w}x{h} -> "
                  f"{imgs[t].shape[1]}x{imgs[t].shape[0]} (mem budget)")
    return imgs


class TextureStorage:
    """Host-side packed texture heap; `.texels` / `.table` / `.samplers`
    go to device. Samplers carry the 2-row texcoord matrix + input gamma
    (SWTexSampler, cfetch.h:108-131); flags carry clamp/wrap addressing."""

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self._table: list[tuple[int, int, int, int]] = []
        self._samplers: list[tuple] = []
        self._offset = 0
        # slot 0 = 1x1 white fallback so tex_id 0 (or missing) is benign
        self.add(np.ones((1, 1, 4), np.float32))

    def add(self, img: np.ndarray, matrix=None, flags: int = 0,
            gamma: float = 1.0) -> int:
        h, w = img.shape[:2]
        flat = np.ascontiguousarray(img.reshape(-1, 4), np.float32)
        self._chunks.append(flat)
        self._table.append((self._offset, w, h, flags))
        if matrix is None:
            row = (1.0, 0.0, 0.0, 0.0, 1.0, 0.0, gamma, 0.0)
        else:
            m = np.asarray(matrix, np.float32)
            row = (float(m[0, 0]), float(m[0, 1]), float(m[0, 3]),
                   float(m[1, 0]), float(m[1, 1]), float(m[1, 3]),
                   gamma, 0.0)
        self._samplers.append(row)
        self._offset += flat.shape[0]
        return len(self._table) - 1

    def set_sampler(self, slot: int, matrix, flags: int, gamma: float):
        m = np.asarray(matrix, np.float32)
        self._samplers[slot] = (float(m[0, 0]), float(m[0, 1]), float(m[0, 3]),
                                float(m[1, 0]), float(m[1, 1]), float(m[1, 3]),
                                gamma, 0.0)
        off, w, h, _ = self._table[slot]
        self._table[slot] = (off, w, h, flags)

    def finalize(self):
        texels = np.concatenate(self._chunks, axis=0)
        table = np.asarray(self._table, np.int32)
        samplers = np.asarray(self._samplers, np.float32)
        # bake per-sampler input gamma into the texels (one sampler per
        # texture here, so the bake is exact) — keeps the per-fetch gamma
        # path dormant and the fetch cost at round-1 levels
        for slot in range(len(self._table)):
            g = samplers[slot, 6]
            if g != 1.0:
                off, w, h, _ = self._table[slot]
                texels[off:off + w * h, :3] =                     np.maximum(texels[off:off + w * h, :3], 0.0) ** g
                samplers[slot, 6] = 1.0
        return texels, table, samplers


def _height_to_normalmap(height: np.ndarray, amount: float) -> np.ndarray:
    """Numpy Sobel height -> tangent-space normal map, stored remapped to
    [0,1] (ref: NormalmapFromHeight, shaders/image.cl:37)."""
    h = height

    def sh(dy, dx):
        return np.roll(h, (dy, dx), axis=(0, 1))

    gx = (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1)
          - sh(-1, 1) - 2 * sh(0, 1) - sh(1, 1)) / 8.0
    gy = (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1)
          - sh(1, -1) - 2 * sh(1, 0) - sh(1, 1)) / 8.0
    n = np.stack([gx * amount, gy * amount, np.ones_like(h)], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    out = np.ones(h.shape + (4,), np.float32)
    out[..., :3] = n * 0.5 + 0.5
    return out


def bake_aux_normalmaps(desc: SceneDesc, storage: "TextureStorage",
                        fitted: dict | None = None) -> dict:
    """Convert height_bump displacement maps to normal-map texture slots —
    the aux-texture pass of the reference (RenderDriverRTE_AuxTextures.cpp
    GetAuxNormalMapFromDisaplacement, cached per (mat, tex)).
    fitted: budget-fitted source images (fit_texture_res) so baked maps
    honor the aux budget. Returns {material_id: slot}."""
    slots: dict[int, int] = {}
    cache: dict[tuple, int] = {}
    for mid, node in desc.materials.items():
        displ = node.find("displacement")
        if displ is None or displ.get("type") != "height_bump":
            continue
        hm = displ.find("height_map")
        t = hm.find("texture") if hm is not None else None
        if t is None:
            continue
        tid = int(t.get("id", -1))
        amount = float(hm.get("amount", 1.0))
        key = (tid, amount)
        if key not in cache:
            img = fitted.get(tid) if fitted is not None else None
            if img is None:
                img = load_texture_array(desc, tid)
            if img is None:
                continue
            height = img[..., :3].mean(-1)
            cache[key] = storage.add(_height_to_normalmap(height, amount))
        slots[mid] = cache[key]
    return slots


def bake_ies_textures(desc: SceneDesc, storage: "TextureStorage") -> dict:
    """Load IES photometric profiles referenced by lights into spherical
    intensity textures (ref IESRender.cpp CreateSphericalTextureFromIES).
    Returns {light_id: slot}."""
    import os as _os

    from hydracore_tpu.lights.ies import load_ies_texture

    slots: dict[int, int] = {}
    for lid, node in desc.lights.items():
        ies = node.find("ies")
        path = None
        if ies is not None:
            path = ies.get("data") or ies.get("loc")
        if not path:
            continue
        full = path if _os.path.isabs(path) else _os.path.join(desc.lib_dir, path)
        if not _os.path.exists(full):
            continue
        try:
            tex, _peak = load_ies_texture(full)
        except Exception:
            continue
        slots[lid] = storage.add(tex)
    return slots


def build_texture_storage(desc: SceneDesc, budget: int | None = None,
                          budget_bump: int | None = None):
    """Pack every scene texture (+ baked aux normal maps + IES profiles);
    returns (texels, table, id_remap, bump_slots, ies_slots). Textures are
    budget-fitted first (fit_texture_res; override via HYDRA_TEX_MEM_MB /
    HYDRA_TEX_MEM_BUMP_MB or the params)."""
    storage = TextureStorage()
    max_id = max(desc.textures.keys(), default=-1)
    remap = np.zeros(max(max_id + 2, 1), np.int32)  # default white
    is_ldr = {}
    if budget is None:
        budget = int(os.environ.get("HYDRA_TEX_MEM_MB",
                                    TEX_MEM_BUDGET >> 20)) << 20
    if budget_bump is None:
        budget_bump = int(os.environ.get("HYDRA_TEX_MEM_BUMP_MB",
                                         TEX_MEM_BUDGET_BUMP >> 20)) << 20

    # displacement height sources count against the bump/aux budget
    # (AllocAll splits memForTex / memForTex2, RenderDriverRTE.cpp:647)
    bump_src = set()
    for node in desc.materials.values():
        displ = node.find("displacement")
        if displ is not None:
            for t in displ.iter("texture"):
                bump_src.add(int(t.get("id", -1)))

    imgs: dict[int, np.ndarray] = {}
    for tid in sorted(desc.textures.keys()):
        img = load_texture_array(desc, tid)
        if img is not None:
            imgs[tid] = img
    imgs = fit_texture_res(imgs, {t: t in bump_src for t in imgs},
                           budget, budget_bump)

    for tid in sorted(desc.textures.keys()):
        img = imgs.get(tid)
        if img is None:
            remap[tid] = 0
        else:
            # LDR color textures default to input gamma 2.2 (the loader no
            # longer pre-linearizes); overridden by the first XML binding
            ldr = not (desc.textures[tid].loc or "").endswith("image4f")
            is_ldr[tid] = ldr
            remap[tid] = storage.add(img, gamma=2.2 if ldr else 1.0)

    # first XML binding per texture wins: texcoord matrix, addressing
    # flags, input gamma (SWTexSampler semantics; a one-sampler-per-
    # texture simplification of per-binding samplers)
    bound = set()
    for node in desc.materials.values():
        for t in node.iter("texture"):
            tid = int(t.get("id", -1))
            if tid < 0 or tid >= len(remap) or tid in bound or remap[tid] == 0:
                continue
            bound.add(tid)
            mat_attr = t.get("matrix")
            from hydracore_tpu.scene.statefile import parse_floats

            m = (np.asarray(parse_floats(mat_attr), np.float32).reshape(4, 4)
                 if mat_attr else np.eye(4, dtype=np.float32))
            flags = 0
            if (t.get("addressing_mode_u") or "wrap") == "clamp":
                flags |= TEX_CLAMP_U
            if (t.get("addressing_mode_v") or "wrap") == "clamp":
                flags |= TEX_CLAMP_V
            g = float(t.get("input_gamma", 2.2 if is_ldr.get(tid) else 1.0))
            storage.set_sampler(int(remap[tid]), m, flags, g)

    bump_slots = bake_aux_normalmaps(desc, storage, imgs)
    ies_slots = bake_ies_textures(desc, storage)
    texels, table, samplers = storage.finalize()
    return texels, table, samplers, remap, bump_slots, ies_slots
