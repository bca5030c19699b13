#!/bin/bash
# Sequential TPU validation+measurement queue (one python at a time,
# 90s claim-release gaps). Logs per step in /tmp/q_*.log.
#
# Ordering: the headline bench first (a driver-verifiable number is the
# round's most important artifact if the tunnel flakes again), then the
# decision-critical A/B (rows-sq8 tiled routing landed as the TPU
# default UNMEASURED — if tiled is >=15% slower at <=HBM scale, gate
# _tiled_rows_ok by corpus size or flip it back), then the codec
# ladders, suite, exactness (7 checks — sharded code tier is new in
# round 4), and the 100M demo.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q() {  # Q <name> <timeout_s> <cmd...>
  echo "$(date +%T) START $1" >> /tmp/tpu_queue.log
  timeout "$2" "${@:3}" > "/tmp/q_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue.log
  sleep 90
}
echo "$(date +%T) queue begin" > /tmp/tpu_queue.log
# Wait out the tunnel outage: probe jax.devices() in a bounded
# subprocess until it answers (a killed probe holds the device claim
# ~60-90 s — space retries accordingly). Bounded at ~10 h.
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; jax.devices()" \
      > /dev/null 2>&1; then
    echo "$(date +%T) backend up after $i probes" >> /tmp/tpu_queue.log
    sleep 30
    break
  fi
  echo "$(date +%T) probe $i: backend unavailable" >> /tmp/tpu_queue.log
  [ "$i" = 60 ] && { echo "$(date +%T) giving up" >> /tmp/tpu_queue.log;
                     exit 2; }
  sleep 420
done
Q headline      1200 python bench.py
Q ivf_code      3600 python bench_all.py ivf_code
Q ivf_code_pq   5400 python bench_all.py ivf_code_pq
Q ivf_corr      5400 python bench_all.py ivf_corr
Q tpu_suite     3600 env SMQTK_TPU_TESTS=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/ -q
Q exactness     1800 python tools/verify_exactness.py
Q ivf100m       2400 python examples/ivf_100m.py
Q headline2     1200 python bench.py
echo "$(date +%T) queue done" >> /tmp/tpu_queue.log