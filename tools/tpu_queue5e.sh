#!/bin/bash
# Round-5 TPU queue, part 5: validate HEAD (store-review + kernel-review
# fixes) on chip — exactness drives then a bench sanity. Logs /tmp/q5e_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5e start" > /tmp/tpu_queue5e.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5e.log
  timeout "$2" "${@:3}" > "/tmp/q5e_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5e.log
  sleep 90
}
sleep 60   # let any previous TPU claim drain
Q exact 3600 python tools/verify_exactness.py
Q bench 2400 python bench.py
echo "$(date +%T) queue5e done" >> /tmp/tpu_queue5e.log
