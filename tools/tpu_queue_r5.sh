#!/bin/bash
# Round-5 TPU work queue — run AFTER tools/ab_subg.py releases the chip.
# Each step logs to /tmp/tpuq5_<step>.log; safe to re-run (compile cache).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}

run() {
  name=$1; shift
  echo "=== $name: $*"
  timeout "${STEP_TIMEOUT:-3000}" "$@" >"/tmp/tpuq5_${name}.log" 2>&1
  rc=$?
  tail -8 "/tmp/tpuq5_${name}.log"
  echo "=== $name rc=$rc"
}

timeout 300 python -c "import jax; print(jax.devices())" || { echo TUNNEL_DOWN; exit 1; }

# 1. fresh stage-floor pricing post r4 floor cuts (what to fuse next)
run floor_256k python tools/exp_stage_floor.py 262144

# 2. big-scene decision data (VERDICT r5 #3): partitioned chain +
#    big mode small-scene sanity + VMEM-cap alternative
run partition python tools/exp_partition.py
run bigmode_small env HYDRA_CL_MAX_CP=64 HYDRA_VMEM_MAX_CP=64 \
    python tools/exp_bigmode.py /root/reference/hydra_app/tests/test_224 65536
run bigmode python tools/exp_bigmode.py \
    /root/reference/hydra_app/tests/Benchmark_Scene03 65536

# 3. on-hardware test lane (VERDICT r5 #5) — writes docs/TPU_TESTS_r5.log
run tpu_tests env HYDRA_TPU_TESTS_LOG=docs/TPU_TESTS_r5.log \
    python tools/tpu_tests.py

echo "queue done; logs in /tmp/tpuq5_*.log"
