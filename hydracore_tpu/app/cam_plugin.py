"""Host camera-rays plugin API — custom optics generate rays on the host.

TPU rebuild of the reference camera plugin interface
(cam_plug/CamHostPluginAPI.h:54 IHostRaysAPI::MakeRaysBlock /
:64 AddSamplesContribution, SimpleCamPlugin.cpp) and its double-buffered
async pipeline (GPUOCLLayer.cpp:1464-1483 DoCamPluginRays): the host
produces ray blocks (e.g. tabulated multi-lens optics) while the device
traces the previous block — here the overlap comes from JAX's async
dispatch: the next block is generated on host while the dispatched trace
runs, and results are only materialized one block later.
"""
from __future__ import annotations

from typing import Protocol

import jax
import jax.numpy as jnp
import numpy as np


class HostRaysPlugin(Protocol):
    """MakeRaysBlock / AddSamplesContribution contract."""

    def make_rays_block(self, block_size: int, pass_idx: int):
        """-> (ray_o (B,3) f32, ray_d (B,3) f32, pix (B,) i32)"""

    def add_samples_contribution(self, colors: np.ndarray, pix: np.ndarray):
        """Receive traced radiance for the block's rays."""


class SimplePinholePlugin:
    """Reference SimpleCamPlugin analogue: jittered pinhole rays on host."""

    def __init__(self, scene, seed: int = 777):
        self.scene = scene
        cam = scene.camera
        self.W, self.H = int(cam.width), int(cam.height)
        self.rng = np.random.default_rng(seed)
        self.fb = np.zeros((self.H * self.W, 3), np.float64)
        self.counts = np.zeros(self.H * self.W, np.int64)
        # host-side camera model
        self.proj_inv = np.asarray(cam.mProjInv)
        self.view_inv = np.asarray(cam.mWorldViewInv)
        self.pos = np.asarray(cam.pos)

    def make_rays_block(self, block_size: int, pass_idx: int):
        R = self.H * self.W
        start = (pass_idx * block_size) % R
        pix = (np.arange(block_size) + start) % R
        px = (pix % self.W).astype(np.float32)
        py = (pix // self.W).astype(np.float32)
        jit = self.rng.random((block_size, 2)).astype(np.float32)
        x = (px + jit[:, 0]) / self.W * 2.0 - 1.0
        y = 1.0 - (py + jit[:, 1]) / self.H * 2.0
        ndc = np.stack([x, y, np.zeros_like(x), np.ones_like(x)], -1)
        pv = ndc @ self.proj_inv.T
        d_view = pv[:, :3] / np.maximum(np.abs(pv[:, 3:4]), 1e-12)
        d_view /= np.linalg.norm(d_view, axis=1, keepdims=True)
        d_world = d_view @ self.view_inv[:3, :3].T
        d_world /= np.linalg.norm(d_world, axis=1, keepdims=True)
        o = np.broadcast_to(self.pos, d_world.shape)
        return (o.astype(np.float32), d_world.astype(np.float32),
                pix.astype(np.int32))

    def add_samples_contribution(self, colors: np.ndarray, pix: np.ndarray):
        np.add.at(self.fb, pix, colors.astype(np.float64))
        np.add.at(self.counts, pix, 1)

    def image(self):
        return (self.fb / np.maximum(self.counts, 1)[:, None]) \
            .reshape(self.H, self.W, 3).astype(np.float32)


def render_with_plugin(scene, plugin: HostRaysPlugin, n_blocks: int,
                       block_size: int = 1 << 16, max_depth: int | None = None,
                       seed: int = 777):
    """Drive the plugin pipeline: host ray generation overlapped with
    device tracing (one-block latency, like the reference's pinned
    double-buffer + std::async)."""
    from hydracore_tpu.integrators.pt import pt_trace

    md = max_depth or scene.settings.trace_depth
    scene_d = jax.device_put(scene)
    has_alpha = bool(scene.settings.has_alpha) if scene.settings is not None else False

    pending = None  # (dispatched colors, pix) — materialized one block late
    for b in range(n_blocks):
        o, d, pix = plugin.make_rays_block(block_size, b)
        sample_idx = (pix.astype(np.uint32) * np.uint32(0x9E3779B9)
                      ^ np.uint32((b * 0x85EBCA6B) & 0xFFFFFFFF))
        colors, _ = pt_trace(scene_d, jnp.asarray(o), jnp.asarray(d),
                             jnp.asarray(sample_idx), jnp.uint32(seed),
                             max_depth=md, has_alpha=has_alpha)
        if pending is not None:
            pc, ppix = pending
            plugin.add_samples_contribution(np.asarray(pc), ppix)
        pending = (colors, pix)  # async: materializes while next block gens
    if pending is not None:
        pc, ppix = pending
        plugin.add_samples_contribution(np.asarray(pc), ppix)
    return plugin
