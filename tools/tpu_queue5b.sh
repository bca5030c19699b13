#!/bin/bash
# Round-5 TPU queue, part 2 (queue5 exited after its last appended line
# was read — bash reads appended lines only while still positioned
# before them). Serial; logs /tmp/q5_*.log, progress /tmp/tpu_queue5b.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5b start" > /tmp/tpu_queue5b.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5b.log
  timeout "$2" "${@:3}" > "/tmp/q5_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5b.log
  sleep 90
}
Q stage1d 2400 python tools/stage1_analysis.py
Q exact9b 1200 python tools/verify_exactness.py 9
echo "$(date +%T) queue5b done" >> /tmp/tpu_queue5b.log
