#!/bin/bash
# Round-5 TPU queue, part 7 (re-run of lost queue5f after /tmp wipe):
# validate the committed pad_to_k dedup + store-review + kernel-review
# fixes on chip. Order: bench.py first (driver-run at round end — both
# JSON lines must emit), graft entry smoke, then the code-tier
# exactness drives (checks 5-9 touch pallas_ivf/sharded paths).
# Logs /tmp/q5g_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5g start" > /tmp/tpu_queue5g.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5g.log
  timeout "$2" "${@:3}" > "/tmp/q5g_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5g.log
  sleep 90
}
sleep 5
Q bench 2400 python bench.py
Q graft 1800 python __graft_entry__.py
Q exact 3600 python tools/verify_exactness.py 5 6 7 8 9
echo "$(date +%T) queue5g done" >> /tmp/tpu_queue5g.log
