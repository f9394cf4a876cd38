"""Golden-image regression scenes (main_app_tests.cpp:46-164 analogue).

Each entry builds a deterministic scene; goldens are rendered at fixed
seed/spp and committed under tests/golden/. The gate follows the
reference: per-image MSE on the 0..255 LDR scale must stay < 50
(ImagesMSE + `mse < 50.0`, main_app_tests.cpp:29-152)."""
from __future__ import annotations

import numpy as np

from hydracore_tpu.scene.procedural import SceneBuilder

SPP = 64
SEED = 777
SIZE = 64


def scene_cornell_diffuse():
    b = SceneBuilder()
    m = b.lambert([0.65, 0.65, 0.65])
    red = b.lambert([0.7, 0.12, 0.1])
    green = b.lambert([0.12, 0.55, 0.18])
    b.add_box_interior(2.0, m, m, m, red, green)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=SIZE, height=SIZE, trace_depth=4)


def scene_mirror_sphere():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    mirror = b.add_material(refl_color=np.array([0.9, 0.9, 0.9], np.float32))
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([-0.7, -1.3, 0.0], 0.7, mirror)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=SIZE, height=SIZE, trace_depth=4)


def scene_ggx_rough():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    ggx = b.add_material(refl_color=np.array([0.8, 0.7, 0.5], np.float32),
                         refl_dist=2, refl_alpha=0.25, refl_gloss=0.75)
    b.add_box_interior(2.0, ggx, m, m, m, m)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0.5, 5.6], cam_lookat=[0, -0.5, 0],
                   width=SIZE, height=SIZE, trace_depth=4)


def scene_glass_sphere():
    b = SceneBuilder()
    m = b.lambert([0.6, 0.6, 0.6])
    glass = b.add_material(transp_color=np.array([0.95, 0.95, 0.95], np.float32),
                           transp_gloss=1.0, transp_ior=1.5)
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_sphere([0.0, -1.2, 0.5], 0.8, glass)
    b.rect_light([0, 1.95, 0], 0.5, 0.5, [12.0] * 3)
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=SIZE, height=SIZE, trace_depth=5)


def scene_spot_sphere_lights():
    b = SceneBuilder()
    m = b.lambert([0.7, 0.7, 0.7])
    b.add_box_interior(2.0, m, m, m, m, m)
    b.add_light(ltype=1, pos=np.array([0, 1.8, 0], np.float32),
                norm=np.array([0, -1, 0], np.float32),
                intensity=np.array([8.0, 8.0, 7.0], np.float32),
                cos_in=0.9, cos_out=0.6)
    b.sphere_light([1.0, -1.0, 0.0], 0.25, [6.0, 3.0, 2.0])
    return b.build(cam_pos=[0, 0, 5.6], cam_lookat=[0, 0, 0],
                   width=SIZE, height=SIZE, trace_depth=3)


SCENES = {
    "cornell_diffuse": scene_cornell_diffuse,
    "mirror_sphere": scene_mirror_sphere,
    "ggx_rough": scene_ggx_rough,
    "glass_sphere": scene_glass_sphere,
    "spot_sphere": scene_spot_sphere_lights,
}

# ---- statefile-path goldens over the reference's bundled scene libraries
# (main_app_tests.cpp:46-164 runs the same statefiles through the real
# renderer and gates MSE<50): these pin the FULL ingestion path — XML
# materials/lights/camera, vsgf meshes, texture heap — not just the
# procedural builder. Rendered at 256^2 like the reference gate's scale;
# spp is low because the pin is deterministic (same seed + CPU backend =>
# near-bit-exact), catching semantic regressions rather than noise.
STATEFILE_ROOT = "/root/reference/hydra_app/tests"
STATEFILE_SCENES = {
    "sf_test_42": ("test_42", 256, 16),
    "sf_test_42_ggx": ("test_42_ggx", 256, 16),
    "sf_test_42_mirror": ("test_42_with_mirror", 256, 16),
    "sf_test_224": ("test_224", 256, 8),
    "sf_014_bump": ("014_Bump_height", 256, 16),
    "sf_test_223": ("test_223_small", 256, 16),
    # ---- the rest of the reference's bundled libraries (all 16 covered;
    # 128^2 / low spp keeps the CPU gate tractable — the pin is still
    # deterministic, so any semantic regression trips MSE<50 immediately)
    "sf_test_42_beckmann": ("test_42_beckmann", 128, 8),
    "sf_test_224_sphere": ("test_224_sphere", 128, 4),
    "sf_test_224_sphere_mf": ("test_224_sphere_microfacet", 128, 4),
    "sf_test_aniso": ("test_aniso", 128, 4),
    "sf_test_aniso2": ("test_aniso2", 128, 4),
    "sf_test_pool": ("test_pool", 128, 4),
    "sf_teapot_cylinder": ("teapot_cylinder", 128, 4),
    "sf_demo_05": ("demo_05", 128, 4),
    "sf_demo_06": ("demo_06", 128, 4),
    "sf_bench03": ("Benchmark_Scene03", 128, 2),
}


def hdr_to_ldr255(img, gamma=2.2):
    x = np.clip(np.asarray(img), 0.0, 1.0) ** (1.0 / gamma)
    return (x * 255.0).astype(np.float32)


def render_golden(name):
    import os

    from hydracore_tpu.integrators.pt import render

    if name in STATEFILE_SCENES:
        from hydracore_tpu.scene.scene import load_scene

        lib, size, spp = STATEFILE_SCENES[name]
        sc = load_scene(os.path.join(STATEFILE_ROOT, lib),
                        width=size, height=size)
        return hdr_to_ldr255(render(sc, spp=spp, seed=SEED))
    sc = SCENES[name]()
    return hdr_to_ldr255(render(sc, spp=SPP, seed=SEED))


ALL_GOLDEN = {**SCENES, **{k: None for k in STATEFILE_SCENES}}
