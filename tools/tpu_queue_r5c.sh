#!/bin/bash
# Round-5 merged TPU queue (session 2, fresh compile cache). Ordered by
# decision value: stage floor + gather-fuse pricing (shade-chain fusion),
# big-scene numbers (gate decision), Benchmark_Scene03 render differential,
# on-hardware test lane (commits docs/TPU_TESTS_r5.log content).
# Launch: nohup bash tools/tpu_queue_r5c.sh > /tmp/tpuq5c.log 2>&1 &
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

# 1. fresh per-stage floor numbers (post r4 floor cuts) + gather-fuse pricing
run stage_floor python -u tools/exp_stage_floor.py 262144
run gather_fuse python -u tools/exp_gather_fuse.py 262144

# 2. big-scene decision data (VERDICT r5 #3) — decision closed r5: the
#    partitioned chain won (1.2 Mrays/s vs big mode 0.7); exp_bigmode and
#    the HBM big mode were deleted with it.
run partition python -u tools/exp_partition.py
run vmem_scale env HYDRA_CL_MAX_CP=4096 \
    python -u tools/exp_partition.py

# 3. Benchmark_Scene03 @256^2 real-camera render differential
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

# 4. on-hardware test lane (VERDICT r5 #5) — writes docs/TPU_TESTS_r5.log
run tpu_tests python -u tools/tpu_tests.py

echo "queue r5c done; logs in /tmp/tpuq5_*.log"
