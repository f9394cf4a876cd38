#!/bin/bash
# Round-3 TPU work queue (docs/ROUND3_NOTES.md) — run when the tunnel is up.
# Each step logs to /tmp/tpuq_<step>.log; safe to re-run (compile cache).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "${STEP_TIMEOUT:-3000}" "$@" >"/tmp/tpuq_${name}.log" 2>&1
  rc=$?
  tail -5 "/tmp/tpuq_${name}.log"
  echo "=== $name rc=$rc"
}

# 0. is the tunnel up at all?
timeout 90 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }

# 1. floor breakdown at two widths (flat-in-R => raise MEGABLOCK)
run floor_256k python tools/exp_stage_floor.py 262144
run floor_1m   python tools/exp_stage_floor.py 1048576

# 2. big-mode hardware validation (forced on test_224), then the VMEM-cap
#    alternative for Benchmark_Scene03. NOTE: use `env VAR=… python` — a
#    `VAR=x run …` prefix on a bash FUNCTION call leaks the var into every
#    later step.
run bigmode python tools/exp_bigmode.py
run bigvmem env HYDRA_CL_MAX_CP=4352 HYDRA_VMEM_MAX_CP=4352 \
    python tools/exp_bigmode.py \
    /root/reference/hydra_app/tests/Benchmark_Scene03 65536
# 2b. partitioned cluster chain (the DEFAULT big-scene path now): parity
#     vs the wide loop + Mrays/s on Benchmark_Scene03
run partition python tools/exp_partition.py

# 3. depth sweep + traversal-only (the MRaysStat breakdown)
run profile python tools/exp_profile_r3.py 1024

# 4. bench — autotunes over the _CONFIGS list itself (fuse/regen/mb20/…);
#    full protocol = tune@1024 + headline + retune@512 + tiny + big scene,
#    needs more than the default step budget (inline, not run(): the helper
#    caps every step at STEP_TIMEOUT)
echo "=== bench: python bench.py"
timeout 9000 python bench.py >/tmp/tpuq_bench.log 2>&1
rc=$?
tail -5 /tmp/tpuq_bench.log
echo "=== bench rc=$rc"

echo "queue done; logs in /tmp/tpuq_*.log"
