#!/bin/bash
# Paired A/B: alternate r13-HEAD (worktree) and r14-HEAD (main) headline bench
# runs in one session window; record load1 before each run.
set -u
LOGDIR=/root/repo/.ab_logs
for pair in 1 2 3 4; do
  for side in r13 r14; do
    if [ "$side" = r13 ]; then DIR=/root/repo/.ab_r13; else DIR=/root/repo/.ab_r14; fi
    L1=$(cut -d' ' -f1 /proc/loadavg)
    echo "=== pair $pair side $side load1_before $L1 $(date +%T) ===" >> "$LOGDIR/ab.log"
    (cd "$DIR" && SPARK_GRAFT_BENCH_TAG="ab15_${side}_p${pair}" \
      python bench.py > "$LOGDIR/${side}_p${pair}.json" 2> "$LOGDIR/${side}_p${pair}.err")
    echo "rc=$? done $(date +%T)" >> "$LOGDIR/ab.log"
  done
done
echo ALL_DONE >> "$LOGDIR/ab.log"
