#!/bin/bash
# Wait for an idle-range host phase (bench.py's own parallel-CPU probe,
# warm-parent variant, below $THRESH), then run the frozen bench at
# sf1.0-replica and sf0.1 back to back. Polls every 3 minutes up to
# $MAX_POLLS; runs anyway when the window closes.
THRESH=${1:-0.15}
MAX_POLLS=${2:-60}
for i in $(seq 1 "$MAX_POLLS"); do
  P=$(python /tmp/warm_probe.py)
  echo "$(date +%H:%M:%S) probe $P" >> /tmp/cool2.probes
  ok=$(python -c "print(1 if $P < $THRESH else 0)")
  if [ "$ok" = "1" ]; then break; fi
  sleep 180
done
echo "$(date +%H:%M:%S) RUNNING sf1.0" >> /tmp/cool2.probes
SPARK_GRAFT_SF_DIR=/tmp/sfrep1.0 SPARK_GRAFT_CPUS=32 python bench.py > /tmp/bench_cool2_sf1.log 2>&1
echo "$(date +%H:%M:%S) RUNNING sf0.1" >> /tmp/cool2.probes
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py > /tmp/bench_cool2_sf01.log 2>&1
echo "$(date +%H:%M:%S) DONE" >> /tmp/cool2.probes
