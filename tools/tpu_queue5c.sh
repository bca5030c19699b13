#!/bin/bash
# Round-5 TPU queue, part 3: the MXU-engine fused LSH A/B + the final
# headline/serving bench sanity. Logs /tmp/q5_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5c start" > /tmp/tpu_queue5c.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5c.log
  timeout "$2" "${@:3}" > "/tmp/q5_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5c.log
  sleep 90
}
Q lsh_e2e_c 3600 python bench_all.py lsh_e2e
Q bench 2400 python bench.py
echo "$(date +%T) queue5c done" >> /tmp/tpu_queue5c.log
