#!/bin/bash
# Round-5 supplementary TPU queue (after the main r5 queue):
#  - gather-fusion pricing (fixed: tables as jit args, not HLO consts)
#  - TRUE HBM big mode on Benchmark_Scene03 (unpartitioned pool, VMEM cap 1024)
#  - Benchmark_Scene03 @256^2 render differential (prices the r5 per-chunk
#    ray culling on a REAL camera render, where chunk locality exists)
#  - refreshed on-hardware test lane (trimmed-MSE gate + fixed log path)
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "${STEP_TIMEOUT:-3000}" "$@" >"/tmp/tpuq5_${name}.log" 2>&1
  rc=$?
  tail -10 "/tmp/tpuq5_${name}.log"
  echo "=== $name rc=$rc"
}

timeout 300 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }

run gather_fuse2 python -u tools/exp_gather_fuse.py 262144

run bigmode_true env HYDRA_CL_MAX_CP=8192 HYDRA_VMEM_MAX_CP=1024 \
    python -u tools/exp_bigmode.py /root/reference/hydra_app/tests/Benchmark_Scene03 65536

run bench03_render python -u - <<'EOF'
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from hydracore_tpu.scene.scene import load_scene
from hydracore_tpu.integrators.pt import render_passes
W = 256
scene = jax.device_put(load_scene(
    "/root/reference/hydra_app/tests/Benchmark_Scene03", width=W, height=W))
seed = jnp.uint32(777)
def run(n, base):
    fb, rays = render_passes(scene, jnp.uint32(base), seed, n_pass=n, max_depth=5)
    np.asarray(fb); return float(rays)
run(1, 0); run(5, 100)
def timed(n, base):
    t0 = time.perf_counter(); run(n, base); return time.perf_counter() - t0
ds = []
for i in range(4):
    tl = timed(1, 200 + 100*i); th = timed(5, 250 + 100*i)
    ds.append((th - tl) / 4)
d = sorted(ds)[len(ds)//2]
print("bench03 256^2 d5: %.3f Msamples/s (median of %d)" % (W*W/d/1e6, len(ds)), flush=True)
EOF

run tpu_tests2 python -u tools/tpu_tests.py

echo "queue r5b done"
