#!/bin/bash
# Poll the axon TPU tunnel; when jax.devices() answers, run the round-3
# work queue (tools/tpu_queue.sh). Safe to leave running in tmux.
cd /root/repo
while true; do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[tpu_watch] tunnel UP at $(date)"
    STEP_TIMEOUT=3600 bash tools/tpu_queue.sh 2>&1 | tee /tmp/tpuq_all.log
    echo "[tpu_watch] queue finished at $(date)"
    break
  fi
  echo "[tpu_watch] down at $(date); retry in 300s"
  sleep 300
done
