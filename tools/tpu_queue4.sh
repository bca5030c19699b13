#!/bin/bash
# Round-4 metric-axis on-chip validation + measurement, one TPU process
# at a time (CLAUDE.md: a killed claim lingers 60-90s; clean exits are
# immediate but keep a buffer). Logs /tmp/q4_*.log, progress
# /tmp/tpu_queue4.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue4 start" > /tmp/tpu_queue4.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue4.log
  timeout "$2" "${@:3}" > "/tmp/q4_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue4.log
  sleep 60
}
Q exact8    1800 python tools/verify_exactness.py 8
Q metric_ab 2400 python tools/metric_ab.py
Q tests_metric 1200 env SMQTK_TPU_TESTS=1 \
  python -m pytest tests/impls/nn_index/test_ivf_code_metrics.py -q
echo "$(date +%T) queue4 done" >> /tmp/tpu_queue4.log
