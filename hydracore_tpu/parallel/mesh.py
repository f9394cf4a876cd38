"""Multi-chip rendering: device-mesh sharding of the sample stream.

TPU-native replacement for the reference's multi-GPU scheme (one process per
GPU + OS shared-memory accumulator image, SURVEY.md §2.3/§5): the scene is
replicated per chip, the per-pass ray megablock is sharded over a 1D
jax.sharding.Mesh, and the framebuffer is combined with XLA collectives over
ICI instead of a host shared-memory lock.

Two sharding modes (both exact):
  * pixel-sharded  — each chip owns a contiguous strip of pixels per pass;
    contribution needs no collective (framebuffer stays sharded until read).
  * sample-sharded — each chip renders ALL pixels with a different QMC pass
    offset (qmcPos = pass * n_chips + chip, SURVEY.md §5 'distributed
    communication backend'); framebuffers are psum-reduced over ICI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hydracore_tpu.integrators.pt import make_eye_rays, pt_trace
from hydracore_tpu.ops import rng
from hydracore_tpu.integrators.pt import DG_LENS


def make_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("d",))


def _trace_pixels(scene, pix, pass_idx, seed, width, height, max_depth):
    """Trace one sample for each pixel id in `pix` (any shape (R,))."""
    px = (pix % width).astype(jnp.int32)
    py = (pix // width).astype(jnp.int32)
    sample_idx = pix * jnp.uint32(0x9E3779B9) ^ jnp.uint32(pass_idx)
    qmc_idx = jnp.broadcast_to(pass_idx.astype(jnp.uint32), pix.shape)
    jitter = rng.screen_sample(qmc_idx, pix)
    lens = rng.rand2(sample_idx, 0, DG_LENS, seed)
    ray_o, ray_d = make_eye_rays(scene.camera, px, py, jitter, lens)
    color, rays = pt_trace(scene, ray_o, ray_d, sample_idx, seed, max_depth=max_depth)
    return jnp.clip(color, 0.0, 1e6), rays


@partial(jax.jit, static_argnames=("mesh", "max_depth"))
def render_pass_sample_sharded(scene, pass_idx, seed, mesh: Mesh, max_depth: int = 5):
    """Each chip renders every pixel with its own pass offset; the result is
    the psum-averaged framebuffer (replicated) — n_chips samples per pixel
    per call. This is the flagship multi-chip step (dryrun_multichip)."""
    W, H = scene.camera.width, scene.camera.height
    n = mesh.devices.size

    def body(scene):
        chip = jax.lax.axis_index("d")
        pix = jnp.arange(W * H, dtype=jnp.uint32)
        my_pass = pass_idx * n + chip.astype(jnp.uint32)
        color, rays = _trace_pixels(scene, pix, my_pass, seed, W, H, max_depth)
        fb = color.reshape(H, W, 3)
        fb = jax.lax.psum(fb, "d") / n  # ICI all-reduce
        rays = jax.lax.psum(rays, "d")
        return fb, rays

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),), out_specs=(P(), P()),
    )(scene)


@partial(jax.jit, static_argnames=("mesh", "max_depth"))
def render_pass_pixel_sharded(scene, pass_idx, seed, mesh: Mesh, max_depth: int = 5):
    """Pixels strip-sharded across chips; one sample per pixel per call.
    No collectives on the hot path; the output is sharded over rows."""
    W, H = scene.camera.width, scene.camera.height
    n = mesh.devices.size
    assert (W * H) % n == 0, "pixel count must divide the mesh"

    def body(scene, pix):
        color, rays = _trace_pixels(scene, pix[0], pass_idx, seed, W, H, max_depth)
        return color[None], rays[None]

    pix_all = jnp.arange(W * H, dtype=jnp.uint32).reshape(n, -1)
    color, rays = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P("d", None)), out_specs=(P("d", None), P("d")),
    )(scene, pix_all)
    return color.reshape(H, W, 3), rays.sum()


def render_distributed(scene, spp: int, mesh: Mesh | None = None, seed: int = 777,
                       max_depth: int | None = None, mode: str = "sample"):
    """Host pass loop over the mesh; returns (H, W, 3) mean radiance."""
    mesh = mesh or make_mesh()
    md = max_depth or scene.settings.trace_depth
    n = mesh.devices.size
    H, W = scene.camera.height, scene.camera.width
    fb = jnp.zeros((H, W, 3), jnp.float32)
    if mode == "sample":
        n_calls = max(spp // n, 1)
        for i in range(n_calls):
            color, _ = render_pass_sample_sharded(scene, jnp.uint32(i), jnp.uint32(seed), mesh, md)
            fb = fb + color
        return fb / n_calls
    else:
        for i in range(spp):
            color, _ = render_pass_pixel_sharded(scene, jnp.uint32(i), jnp.uint32(seed), mesh, md)
            fb = fb + color
        return fb / spp


@partial(jax.jit, static_argnames=("mesh", "n_paths", "max_depth"))
def render_lt_pass_sharded(scene, pass_idx, seed, mesh: Mesh,
                           n_paths: int, max_depth: int = 5):
    """Distributed light tracing: each chip traces its own light-path
    stream (pass offset = pass * n_chips + chip, the same stream-sharding
    rule the PT path uses) and splats locally; framebuffers psum over ICI.
    The reference reaches the same result with one LT process per GPU
    adding into the shared accumulator image (SURVEY §2.3 multi-GPU)."""
    from hydracore_tpu.integrators.lt import lt_pass

    n = mesh.devices.size

    def body(scene):
        chip = jax.lax.axis_index("d")
        my_pass = pass_idx * n + chip.astype(jnp.uint32)
        img, paths = lt_pass(scene, my_pass, seed, n_paths, max_depth=max_depth)
        return jax.lax.psum(img, "d") / n, jax.lax.psum(paths, "d")

    return jax.shard_map(body, mesh=mesh, in_specs=(P(),),
                         out_specs=(P(), P()))(scene)


def render_lt_distributed(scene, n_passes: int, mesh: Mesh | None = None,
                          seed: int = 777, paths_per_pass: int | None = None,
                          max_depth: int | None = None):
    """(H, W, 3) LT estimate using n_passes * n_chips light-path streams."""
    mesh = mesh or make_mesh()
    md = max_depth or scene.settings.trace_depth
    H, W = scene.camera.height, scene.camera.width
    n_paths = paths_per_pass or (W * H)
    n_calls = max(n_passes // mesh.devices.size, 1)
    fb = jnp.zeros((H, W, 3), jnp.float32)
    for i in range(n_calls):
        img, _ = render_lt_pass_sharded(scene, jnp.uint32(i), jnp.uint32(seed),
                                        mesh, n_paths, md)
        fb = fb + img
    return fb / n_calls
