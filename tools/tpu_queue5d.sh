#!/bin/bash
# Round-5 TPU queue, part 4: validate the kernel-review fixes on chip
# (exactness drives incl. tiled table SQ8/PQ/residual/cosine vs float64),
# then a bench sanity. Logs /tmp/q5d_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5d start" > /tmp/tpu_queue5d.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5d.log
  timeout "$2" "${@:3}" > "/tmp/q5d_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5d.log
  sleep 90
}
sleep 90   # let the previous TPU claim drain
Q exact 3600 python tools/verify_exactness.py
Q bench 2400 python bench.py
echo "$(date +%T) queue5d done" >> /tmp/tpu_queue5d.log
