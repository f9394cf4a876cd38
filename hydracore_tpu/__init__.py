"""hydracore_tpu — a TPU-native wavefront path tracing framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of HydraCore
(Ray-Tracing-Systems/HydraCore): scene ingestion (HydraAPI statefile XML +
binary chunks), flattened material/light tables, BVH construction, and a
wavefront path tracer (PT/MISPT first; LT/IBPT/SBDPT/MMLT transports as the
framework grows) running as batched SPMD compute over device meshes.

Layer map (TPU-native analogue of reference SURVEY.md §1):
  app/         CLI + render loop            (ref: hydra_app/)
  scene/       statefile XML + chunk loader, material/light compilers
               (ref: hydra_drv/RenderDriverRTE*.cpp, PlainMaterialConverter)
  bvh/         SAH BVH builder + flat SoA layout (ref: bvh_builder/)
  ops/         device kernels: traversal, intersect, sort, texture fetch
               (ref: hydra_drv/shaders/*.cl, ctrace.h)
  bsdf/        BSDF sample/eval library      (ref: cmaterial.h, cmatpbrt.h)
  lights/      light sampling + pdf tables   (ref: clight.h)
  integrators/ oracle MISPT + wavefront PT   (ref: CPUExp_Integrators*, GPUOCLLayerCore.cpp)
  parallel/    device-mesh sharding, psum framebuffer (ref: shared-memory accum image)
  utils/       framebuffer, tonemap, image IO
"""

__version__ = "0.1.0"

from hydracore_tpu.scene.scene import SceneData, load_scene  # noqa: F401
