#!/bin/bash
# Interleaved r5-vs-r4 race at config[3] (1k genomes): r4's sequential
# c3 race fell in a bad-weather window (single 1849 s rep before the
# campaign timeout); alternating single reps give it a fair shot.
# Waits for bench.py smoke (this script is launched after it).
set -u
LOG=/tmp/r5_bench
E3="DTPU_E2E_N=1000 DTPU_E2E_LEN=200000 DTPU_E2E_S=14 DTPU_E2E_K=21"

for rep in 1 2 3; do
  for side in r5b r4race; do
    echo "=== c3il_${side}_$rep start $(date +%T) ===" | tee -a $LOG/interleave_c3.log
    (cd /tmp/$side && timeout 2400 env $E3 DTPU_REPO=/tmp/$side \
        python benchmarks/e2e_100.py 1) \
        >>$LOG/c3il_$side.out 2>>$LOG/c3il_$side.err
    echo "=== c3il_${side}_$rep rc=$? end $(date +%T) ===" | tee -a $LOG/interleave_c3.log
  done
done
echo "C3 INTERLEAVE DONE $(date +%T)" | tee -a $LOG/interleave_c3.log
