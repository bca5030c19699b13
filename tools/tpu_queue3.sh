#!/bin/bash
# Round-4 follow-on: wait for tools/tpu_queue2.sh to finish, then run
# the gather-prefetch A/B (authored after queue2 started). Launch
# detached; logs /tmp/q3_*.log, progress /tmp/tpu_queue3.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue3 waiting for queue2" > /tmp/tpu_queue3.log
while :; do
  grep -q "queue2 ab done" /tmp/tpu_queue2.log 2>/dev/null && break
  kill -0 "$(cat /tmp/tpu_queue2.pid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done
echo "$(date +%T) queue2 finished; waiting out the claim" >> /tmp/tpu_queue3.log
sleep 120
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue3.log
  timeout "$2" "${@:3}" > "/tmp/q3_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue3.log
  sleep 90
}
Q gather_ab   1800 python tools/profile_gather.py
Q profile100m 1800 python tools/profile_100m.py
echo "$(date +%T) queue3 done" >> /tmp/tpu_queue3.log
