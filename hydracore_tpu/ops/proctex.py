"""Procedural textures: jax-traceable user callables + statefile stdlib.

TPU rebuild of the reference's procedural-texture system
(RenderDriverRTE_ProcTex.cpp: user OpenCL snippets are spliced into
texproc.cl at #PUT_YOUR_PROCEDURAL_TEXTURES_HERE and recompiled at
runtime; ProcTexExec evaluates them per hit with per-material arg stacks
read from prtexDataTail). Runtime C codegen is replaced by two paths:

  * a registry of jax-traceable Python callables — "recompilation" is just
    jit retracing, which XLA does natively;
  * statefile ingestion (scene/materials.py): `type="proc"` textures whose
    `name`/`main` matches a known stdlib entry (the patterns the reference
    ships under pluginFiles/ProceduralTextures) bind to the jax
    implementations below; per-material `<arg val=…>` stacks ride the
    material record (MA_PROC_ARG*, the prtexDataTail analogue). Unknown
    procedural code warns loudly instead of silently dropping
    (RenderDriverRTE_ProcTex.cpp:467-563 semantics).

Callable protocol (new style):

    fn(uv (R,2), pos (R,3), normal (R,3), wo (R,3), args (R,A), sample2d)
        -> color (R,3)

where sample2d(slot (R,) float-coded texture id, uv (R,2)) -> (R,4) samples
the scene texture heap. Legacy 3-arg callables fn(uv, pos, normal) keep
working.
"""
from __future__ import annotations

import inspect
import warnings

import jax.numpy as jnp

_REGISTRY: list = []  # entries: (fn, n_params)


def register_proc_tex(fn) -> int:
    """Register a procedural texture; returns its id for material records
    (MaterialTable.diff_proc)."""
    try:
        n = sum(1 for p in inspect.signature(fn).parameters.values()
                if p.default is inspect.Parameter.empty)
    except (TypeError, ValueError):
        n = 3
    _REGISTRY.append((fn, n))
    return len(_REGISTRY) - 1


def clear_registry():
    _REGISTRY.clear()


def num_proc_tex() -> int:
    return len(_REGISTRY)


def eval_proc_tex(proc_id, uv, pos, normal, wo=None, args=None, scene=None,
                  ao=None):
    """Evaluate registered textures for per-ray ids (R,); id < 0 -> white.
    All registered branches are traced and blended by id (few proc-texes
    per scene; matches the reference's one-switch-per-hit ProcTexExec,
    texproc.cl:94). ao: (R,) hemisphere occlusion input (readAttr_AO,
    texproc.cl:56) — 1 everywhere when the scene traces no AO probes."""
    R = uv.shape[0]
    out = jnp.ones(uv.shape[:-1] + (3,), jnp.float32)
    if not _REGISTRY:
        return out
    if wo is None:
        wo = normal
    if args is None:
        args = jnp.zeros((R, 8), jnp.float32)
    if ao is None:
        ao = jnp.ones(uv.shape[:-1], jnp.float32)

    if scene is not None:
        from hydracore_tpu.ops.texture import tex_fetch

        def sample2d(slot_f, st):
            return tex_fetch(scene, slot_f.astype(jnp.int32), st)
    else:
        def sample2d(slot_f, st):
            return jnp.ones(st.shape[:-1] + (4,), jnp.float32)

    for i, (fn, n) in enumerate(_REGISTRY):
        if n <= 3:
            val = fn(uv, pos, normal)
        elif n <= 6:
            val = fn(uv, pos, normal, wo, args, sample2d)
        else:  # AO-consuming shader (readAttr_AO semantics)
            val = fn(uv, pos, normal, wo, args, sample2d, ao)
        out = jnp.where((proc_id == i)[..., None], val[..., :3], out)
    return out


# ----------------------------------------------------------------------------
# Stdlib: the procedural textures the reference ships under
# pluginFiles/ProceduralTextures (bundled-scene .c payloads, e.g.
# hydra_app/tests/test_aniso2/data/proctex_0000*.c). Each is the jax
# counterpart of one prtexN_main.
# ----------------------------------------------------------------------------

def falloff(uv, pos, normal, wo, args, sample2d):
    """mix(color1, color2, |cos(N, V)|) — falloff.c prtex1_main.
    args: [0:3) color1, [3:6) color2."""
    cos_a = jnp.abs(jnp.sum(normal * wo, axis=-1, keepdims=True))
    c1, c2 = args[:, 0:3], args[:, 3:6]
    return c1 * (1.0 - cos_a) + c2 * cos_a


def hexaplanar(uv, pos, normal, wo, args, sample2d):
    """Triplanar world-space projection with per-sign texture choice —
    hexaplanar.c prtex2_main. args: [texX1 texY1 texZ1 texX2 texY2 texZ2
    blendSize mapScale] (sampler slots float-coded)."""
    blend = jnp.maximum(args[:, 6], 1e-3)
    scale = jnp.maximum(args[:, 7], 1e-6)
    tx = jnp.where(normal[:, 0] < 0, args[:, 0], args[:, 3])
    ty = jnp.where(normal[:, 1] < 0, args[:, 1], args[:, 4])
    tz = jnp.where(normal[:, 2] < 0, args[:, 2], args[:, 5])

    w = jnp.abs(normal)
    w = jnp.power(jnp.maximum(w, 1e-6), blend[:, None])
    w = jnp.maximum(w, 1e-5) / jnp.sum(w * w, axis=-1, keepdims=True)
    w = w / jnp.sum(w, axis=-1, keepdims=True)

    s = scale[:, None]
    y_uv = jnp.stack([pos[:, 0], pos[:, 2]], -1) / s
    x_uv = jnp.stack([pos[:, 2], pos[:, 1]], -1) / s
    z_uv = jnp.stack([pos[:, 0], pos[:, 1]], -1) / s
    cx = sample2d(tx, x_uv)[:, :3]
    cy = sample2d(ty, y_uv)[:, :3]
    cz = sample2d(tz, z_uv)[:, :3]
    return cx * w[:, 0:1] + cy * w[:, 1:2] + cz * w[:, 2:3]


def ao_dirt(uv, pos, normal, wo, args, sample2d, ao):
    """mix(dirt color, clean color, ao) — the canonical AO-input shader
    shape (dirt-in-crevices; readAttr_AO consumer, texproc.cl:56).
    args: [0:3) dirt color, [3:6) clean color."""
    c_dirt, c_clean = args[:, 0:3], args[:, 3:6]
    a = jnp.clip(ao, 0.0, 1.0)[:, None]
    return c_dirt * (1.0 - a) + c_clean * a


#: statefile `type="proc"` textures resolve here by texture `name` or by
#: the .c main symbol (prtexN_<name>); extend for site-local shader packs.
STDLIB = {
    "falloff": falloff,
    "hexaplanar": hexaplanar,
    "ao_dirt": ao_dirt,
    "dirt": ao_dirt,
}


_STDLIB_IDS: dict = {}  # fn -> registered id (memoized: repeated scene
# loads must not grow the registry — every registered fn is evaluated for
# the whole batch and registry changes retrigger jit tracing)


def register_source_instance(source: str, main: str | None = None,
                             gen_args: list | None = None,
                             cache_key: str | None = None) -> int:
    """Compile proc-tex C SOURCE (the statefile's .c payload) to a jax
    callable and register it — the TPU analogue of the reference's runtime
    OpenCL splice-and-recompile (RenderDriverRTE_ProcTex.cpp:467-563).
    Raises ProcTexCompileError outside the supported subset."""
    from hydracore_tpu.ops.proctex_c import compile_proc_tex

    key = cache_key or (main, source)
    if key in _STDLIB_IDS and _STDLIB_IDS[key] < len(_REGISTRY):
        return _STDLIB_IDS[key]
    fn = compile_proc_tex(source, main=main, gen_args=gen_args)
    # source-compiled shaders take the full 6/7-arg protocol; register with
    # an explicit arity (readAttr_AO consumers need the ao input too)
    _REGISTRY.append((fn, 7))
    _STDLIB_IDS[key] = len(_REGISTRY) - 1
    return _STDLIB_IDS[key]


def register_stdlib_instance(name: str, loc: str = "",
                             main: str | None = None,
                             source: str | None = None,
                             gen_args: list | None = None) -> int:
    """Bind a declared statefile proc texture to a jax implementation:
    1) compile the shader SOURCE itself when available (ops/proctex_c —
       exact, covers arbitrary user code in the supported C subset);
    2) else match the stdlib by texture name / main symbol;
    3) else -1 with a visible warning — the scene renders without it,
       but never silently."""
    if source:
        from hydracore_tpu.ops.proctex_c import ProcTexCompileError

        try:
            return register_source_instance(source, main=main,
                                            gen_args=gen_args,
                                            cache_key=loc or None)
        except ProcTexCompileError as e:
            warnings.warn(
                f"procedural texture '{name}' ({loc}): source translation "
                f"failed ({e}); falling back to the stdlib match",
                stacklevel=2)
    fn = STDLIB.get(name.lower().strip())
    if fn is None and main:
        key = main.lower().strip()
        key = key.split("_", 1)[1] if "_" in key else key  # prtexN_<name>
        fn = STDLIB.get(key)
    if fn is None:
        warnings.warn(
            f"procedural texture '{name}' ({loc}) has no stdlib jax "
            "implementation — register one via "
            "hydracore_tpu.ops.proctex.register_proc_tex/STDLIB; "
            "the material renders without it",
            stacklevel=2,
        )
        return -1
    if fn not in _STDLIB_IDS or _STDLIB_IDS[fn] >= len(_REGISTRY) \
            or _REGISTRY[_STDLIB_IDS[fn]][0] is not fn:
        _STDLIB_IDS[fn] = register_proc_tex(fn)
    return _STDLIB_IDS[fn]


# ---- built-in examples (the reference ships perlin-style noise in
# VolumePerlin; these double as tests and demos)

def checker(uv, pos, normal, scale: float = 8.0):
    c = (jnp.floor(uv[..., 0] * scale) + jnp.floor(uv[..., 1] * scale)) % 2.0
    return jnp.stack([c, c, c], -1)


def _hash3(p):
    x = jnp.sin(p @ jnp.asarray([[127.1, 269.5, 419.2],
                                 [311.7, 183.3, 371.9],
                                 [74.7, 246.1, 124.6]]).T) * 43758.5453
    return x - jnp.floor(x)


def value_noise3(pos, scale: float = 2.0):
    """Trilinear value noise over world position (R,3) -> (R,)."""
    p = pos * scale
    i = jnp.floor(p)
    f = p - i
    f = f * f * (3.0 - 2.0 * f)
    acc = jnp.zeros(pos.shape[:-1])
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = i + jnp.asarray([dx, dy, dz], jnp.float32)
                v = _hash3(corner)[..., 0]
                w = (jnp.where(dx, f[..., 0], 1 - f[..., 0])
                     * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                     * jnp.where(dz, f[..., 2], 1 - f[..., 2]))
                acc = acc + v * w
    return acc


def perlin_marble(uv, pos, normal):
    n = value_noise3(pos, 2.0) + 0.5 * value_noise3(pos, 4.0) + 0.25 * value_noise3(pos, 8.0)
    t = 0.5 + 0.5 * jnp.sin(pos[..., 0] * 4.0 + n * 6.0)
    return jnp.stack([t, t, t], -1)
