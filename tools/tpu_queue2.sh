#!/bin/bash
# Follow-on TPU steps: wait for tools/tpu_queue.sh to finish (or die),
# then run the round-4 probes that were authored after it started.
# Launch detached; logs /tmp/q2_*.log, progress /tmp/tpu_queue2.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue2 waiting for queue1" > /tmp/tpu_queue2.log
while :; do
  grep -q "queue done\|giving up" /tmp/tpu_queue.log 2>/dev/null && break
  # queue1 process gone without a terminal marker (killed/crashed)
  kill -0 "$(cat /tmp/tpu_queue.pid 2>/dev/null)" 2>/dev/null || break
  sleep 60
done
echo "$(date +%T) queue1 finished; waiting out the claim" >> /tmp/tpu_queue2.log
sleep 120
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue2.log
  timeout "$2" "${@:3}" > "/tmp/q2_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue2.log
  sleep 90
}
Q probe_i8 1800 python tools/probe_int8_mxu.py
echo "$(date +%T) queue2 done" >> /tmp/tpu_queue2.log
# Appended while queue2 waits (bash reads on demand): the real-pipeline
# i8dot A/B in one window, gated by the probe result above in analysis.
Q cap_i8   1500 env SMQTK_TPU_SQ8_I8DOT=1 python examples/capacity_100m.py
Q cap_bf16 1500 python examples/capacity_100m.py
echo "$(date +%T) queue2 ab done" >> /tmp/tpu_queue2.log
