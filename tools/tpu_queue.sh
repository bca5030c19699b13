#!/bin/bash
# Sequential TPU validation+measurement queue (one python at a time,
# 90s claim-release gaps). Logs per step in /tmp/q_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q() {  # Q <name> <timeout_s> <cmd...>
  echo "$(date +%T) START $1" >> /tmp/tpu_queue.log
  timeout "$2" "${@:3}" > "/tmp/q_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue.log
  sleep 90
}
echo "$(date +%T) queue begin" > /tmp/tpu_queue.log
Q ivf_code      3600 python bench_all.py ivf_code
Q ivf_code_pq   5400 python bench_all.py ivf_code_pq
Q ivf_corr      5400 python bench_all.py ivf_corr
Q tpu_suite     2400 env SMQTK_TPU_TESTS=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/ -q
Q exactness     1200 python tools/verify_exactness.py
Q ivf100m       2400 python examples/ivf_100m.py
Q headline      1200 python bench.py
echo "$(date +%T) queue done" >> /tmp/tpu_queue.log
