#!/bin/bash
# Round-5 TPU work queue. Each step logs to /tmp/tpuq5_<step>.log; safe to
# re-run (compile cache). Launch detached: setsid bash tools/tpu_queue_r5.sh
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

# 1. gather-fusion pricing (shade-chain fusion decision, VERDICT r5 #2)
run gather_fuse python -u tools/exp_gather_fuse.py 262144

# 2. big-scene decision data (VERDICT r5 #3): partitioned chain +
#    big mode small-scene sanity + VMEM-at-scale alternative
run partition python -u tools/exp_partition.py
run bigmode_small env HYDRA_CL_MAX_CP=64 HYDRA_VMEM_MAX_CP=64 \
    python -u tools/exp_bigmode.py /root/reference/hydra_app/tests/test_224 65536
run bigmode python -u tools/exp_bigmode.py \
    /root/reference/hydra_app/tests/Benchmark_Scene03 65536
# VMEM-at-scale: whole Benchmark_Scene03 cluster pool resident (Cp~2.7k,
# ~16 MiB Woop pool) — no partition chain, no HBM streaming
run vmem_scale env HYDRA_CL_MAX_CP=4096 HYDRA_VMEM_MAX_CP=4096 \
    python -u tools/exp_partition.py

# 3. on-hardware test lane (VERDICT r5 #5) — writes docs/TPU_TESTS_r5.log
run tpu_tests env HYDRA_TPU_TESTS_LOG=docs/TPU_TESTS_r5.log \
    python -u tools/tpu_tests.py

echo "queue done; logs in /tmp/tpuq5_*.log"
