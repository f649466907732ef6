#!/bin/bash
# Interleaved r5-vs-r4 race: alternating single reps so slow tunnel
# weather drift cannot masquerade as a code delta (the sequential
# same-hour race saw the window change under it).  Runs after phase 2.
set -u
LOG=/tmp/r5_bench
mkdir -p $LOG

for i in $(seq 1 1440); do
  grep -q "PHASE2 DONE" $LOG/phase2.log 2>/dev/null && break
  sleep 10
done

cd /tmp
for rep in 1 2 3 4; do
  for side in r5b r4race; do
    echo "=== il_${side}_$rep start $(date +%T) ===" | tee -a $LOG/interleave.log
    # DTPU_REPO pins the child CLI's cwd (hence the imported package) to
    # the side's worktree; r4race's e2e copy is sed-pinned already
    (cd /tmp/$side && timeout 2400 env DTPU_REPO=/tmp/$side \
        python benchmarks/e2e_100.py 1) \
        >>$LOG/il_$side.out 2>>$LOG/il_$side.err
    echo "=== il_${side}_$rep rc=$? end $(date +%T) ===" | tee -a $LOG/interleave.log
  done
done
echo "INTERLEAVE DONE $(date +%T)" | tee -a $LOG/interleave.log
