#!/bin/bash
# Round-5 TPU queue (serial — ONE TPU python at a time; a killed process
# holds the device claim ~60-90s, hence the sleeps).
# Launch detached; logs /tmp/q5_*.log, progress /tmp/tpu_queue5.log.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
echo "$(date +%T) queue5 start" > /tmp/tpu_queue5.log
Q() {
  echo "$(date +%T) START $1" >> /tmp/tpu_queue5.log
  timeout "$2" "${@:3}" > "/tmp/q5_$1.log" 2>&1
  echo "$(date +%T) DONE  $1 rc=$?" >> /tmp/tpu_queue5.log
  sleep 90
}
# 1. Stage-1 decomposition (verdict item 3): full/nomin/nodot x t_step.
Q stage1 2400 python tools/stage1_analysis.py
# 2. The 400M capacity demonstration (verdict item 2).
Q ivf400m 5400 python examples/ivf_400m.py
# 3. End-to-end LSH serving refresh (verdict item 5; fused vs 2-dispatch).
Q lsh_e2e 3600 python bench_all.py lsh_e2e
# 4. Exactness drives, all 8 checks on chip.
Q exact 2400 python tools/verify_exactness.py
echo "$(date +%T) queue5 done" >> /tmp/tpu_queue5.log
# Appended while queue5 runs (bash reads on demand): stage1 retry after
# the OOM fix (donated in-place corpus fill), plus the TPU suite.
Q stage1b 2400 python tools/stage1_analysis.py
Q tpusuite 3600 env SMQTK_TPU_TESTS=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 python -m pytest tests/ -q
echo "$(date +%T) queue5 extras done" >> /tmp/tpu_queue5.log
Q ivf400m_b 5400 python examples/ivf_400m.py
echo "$(date +%T) queue5 400m retry done" >> /tmp/tpu_queue5.log
Q lsh_e2e_b 3600 python bench_all.py lsh_e2e
echo "$(date +%T) queue5 lsh retry done" >> /tmp/tpu_queue5.log
Q exact9 1200 python tools/verify_exactness.py 9
echo "$(date +%T) queue5 exact9 done" >> /tmp/tpu_queue5.log
Q stage1c 2400 python tools/stage1_analysis.py
echo "$(date +%T) queue5 stage1c done" >> /tmp/tpu_queue5.log
Q stage1d 2400 python tools/stage1_analysis.py
echo "$(date +%T) queue5 stage1d done" >> /tmp/tpu_queue5.log
Q exact9b 1200 python tools/verify_exactness.py 9
echo "$(date +%T) queue5 exact9b done" >> /tmp/tpu_queue5.log
