#!/bin/bash
# Probe-gated multi-batch scaling campaign: each batch is one repeat at
# local[1] + local[4] on the 60k corpus, run only when the host-weather
# probe (bench.host_probe) reads quiet (< 1.3x the recorded quiet-window
# reference).  Batches append to bench_out/scaling_runs.jsonl and the
# final bench_scaling.py invocation re-pools without new runs.
set -u
cd /root/repo
BATCHES=${1:-6}
IMAGES=${2:-60000}
for i in $(seq 1 "$BATCHES"); do
  for attempt in 1 2 3 4 5; do
    p=$(python3 -c "import bench; print(bench.host_probe())")
    quiet=$(python3 -c "print(1 if $p < 0.95*1.3 else 0)")
    echo "batch $i attempt $attempt probe=$p quiet=$quiet" >> bench_out/campaign_r5.log
    if [ "$quiet" = "1" ]; then break; fi
    sleep 60
  done
  timeout 2400 python tools/bench_scaling.py "$IMAGES" 1 1 4 \
    >> bench_out/campaign_r5.log 2>&1
done
# final re-pool with zero new runs
timeout 600 python tools/bench_scaling.py "$IMAGES" 0 1 4 \
  >> bench_out/campaign_r5.log 2>&1
echo CAMPAIGN_DONE >> bench_out/campaign_r5.log
