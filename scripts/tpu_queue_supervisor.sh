#!/bin/bash
# Round-5 supervisor for the TPU measurement queue: re-runs the queue
# script until every stage is verified-complete, so a wait_for_tpu
# exhaustion (200 probes ~ 5-10 h through a fast-refusing tunnel) doesn't
# end the watch for the rest of the round.  The queue's /tmp/r4_stages
# .ok files make reruns idempotent — completed stages are never repeated.
LOG=/tmp/r4_queue.log
for round in $(seq 1 50); do
  echo "== supervisor round $round $(date +%H:%M:%S)" >> "$LOG"
  bash /root/repo/scripts/tpu_queue_r4.sh && exit 0
  # exhausted its probe budget or passes: brief pause, then keep watching
  sleep 120
done
echo "== supervisor exhausted $(date +%H:%M:%S)" >> "$LOG"
