import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from hydracore_tpu.scene.scene import load_scene
from hydracore_tpu.integrators.pt import render_passes
scene = jax.device_put(load_scene("/root/reference/hydra_app/tests/test_224", width=256, height=256))
def run(n, base):
    fb, rays = render_passes(scene, jnp.uint32(base), jnp.uint32(777), n_pass=n, max_depth=5)
    np.asarray(fb); return fb
t0 = time.perf_counter(); fb = run(1, 0)
print("compile+run n1 %.1fs mean=%.4f" % (time.perf_counter()-t0, float(jnp.mean(fb))), flush=True)
t0 = time.perf_counter(); run(5, 100)
print("compile+run n5 %.1fs" % (time.perf_counter()-t0,), flush=True)
for i in range(3):
    t0 = time.perf_counter(); run(1, 200+i)
    t1 = time.perf_counter(); run(5, 300+i)
    t2 = time.perf_counter()
    d = (t2-t1-(t1-t0))/4
    print("diff pass %.4fs -> %.2f Msamples/s" % (d, 256*256/d/1e6), flush=True)
