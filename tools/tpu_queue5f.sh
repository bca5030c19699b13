#!/bin/bash
# Round-5 TPU queue, part 6: validate the committed pad_to_k dedup +
# row2list host-keep fixes on chip — the code-tier exactness drives
# (checks 5-9 touch pallas_ivf/sharded paths), then bench.py (BOTH JSON
# lines — the serving line ImportError'd mid-edit in queue5e), then the
# graft entry smoke. Logs /tmp/q5f_*.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5f start" > /tmp/tpu_queue5f.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5f.log
  timeout "$2" "${@:3}" > "/tmp/q5f_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5f.log
  sleep 90
}
sleep 30   # let any previous TPU claim drain
Q exact 3600 python tools/verify_exactness.py 5 6 7 8 9
Q bench 2400 python bench.py
Q graft 1800 python __graft_entry__.py
echo "$(date +%T) queue5f done" >> /tmp/tpu_queue5f.log
