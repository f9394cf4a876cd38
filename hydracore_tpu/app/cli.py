"""Command-line renderer — the hydra_app/main.cpp analogue.

Mirrors the reference CLI surface (hydra_app/input.cpp:167-243):
  -inputlib <dir>   scene library (statefile XML + chunks)
  -out <path>       output PNG
  -statefile <xml>  explicit statefile inside the library
  -spp N | -width/-height | -method X | -seed N | -saveinterval S
  -nowindow 1       accepted for compatibility (always headless)
  -cl_device_id N   accepted for compatibility (device choice is jax's)

Usage: python -m hydracore_tpu.app.cli -inputlib tests/test_42 -out z.png
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hydracore_tpu", add_help=True)
    # single-dash long options, like the reference
    p.add_argument("-inputlib", required=True, help="scene library directory")
    p.add_argument("-out", default="z_out.png")
    p.add_argument("-statefile", default=None)
    p.add_argument("-spp", type=int, default=None)
    p.add_argument("-width", type=int, default=None)
    p.add_argument("-height", type=int, default=None)
    p.add_argument("-method", default=None, help="pathtracing (more transports landing)")
    p.add_argument("-seed", type=int, default=777)
    p.add_argument("-saveinterval", type=float, default=0.0, help="seconds between snapshots")
    p.add_argument("-gamma", type=float, default=2.2)
    p.add_argument("-multichip", type=int, default=0, help="1 = shard samples over all devices")
    p.add_argument("-evalgbuffer", type=int, default=0)
    # compatibility no-ops
    p.add_argument("-nowindow", type=int, default=1)
    p.add_argument("-cl_device_id", type=int, default=0)
    p.add_argument("-cpu_fb", type=int, default=0)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from hydracore_tpu.integrators.pt import render_pass
    from hydracore_tpu.scene.scene import load_scene
    from hydracore_tpu.utils.framebuffer import hdr_to_ldr, save_png

    t0 = time.time()
    scene = load_scene(args.inputlib, width=args.width, height=args.height)
    print(f"[scene] {scene.num_triangles} tris, "
          f"{scene.materials.em_color.shape[0]} materials, "
          f"{scene.lights.ltype.shape[0]} lights, "
          f"{scene.camera.width}x{scene.camera.height} "
          f"({time.time() - t0:.1f}s)")

    spp = args.spp or scene.settings.max_rays_per_pixel
    md = scene.settings.trace_depth

    import jax.numpy as jnp

    if args.multichip:
        from hydracore_tpu.parallel.mesh import make_mesh, render_distributed

        mesh = make_mesh()
        print(f"[mesh] {mesh.devices.size} devices")
        fb = render_distributed(scene, spp, mesh=mesh, seed=args.seed)
        img = np.asarray(fb)
    else:
        import jax

        H, W = scene.camera.height, scene.camera.width
        scene = jax.device_put(scene)
        fb = jnp.zeros((H, W, 3), jnp.float32)
        t_start = time.time()
        last_save = t_start
        for i in range(spp):
            color, rays = render_pass(scene, jnp.uint32(i), jnp.uint32(args.seed), max_depth=md)
            fb = fb + color
            if i == 0:
                fb.block_until_ready()
                print(f"[compile+pass0] {time.time() - t_start:.1f}s")
            now = time.time()
            if args.saveinterval > 0 and now - last_save > args.saveinterval:
                save_png(args.out, hdr_to_ldr(np.asarray(fb) / (i + 1), gamma=args.gamma))
                last_save = now
            if (i + 1) % 16 == 0 or i == spp - 1:
                el = now - t_start
                msps = (i + 1) * W * H / max(el, 1e-9) / 1e6
                print(f"[pass] spp = {i + 1}/{spp}, speed = {msps:.2f} M(samples)/s", flush=True)
        img = np.asarray(fb) / spp

    save_png(args.out, hdr_to_ldr(img, gamma=args.gamma))
    print(f"[done] saved {args.out} in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
