#!/bin/bash
# Round-5 E2E campaign (VERDICT r4 next-round items 1 and 5):
# re-establish the at-scale end-to-end headline with a per-phase split,
# racing round-4 code (worktree /tmp/r4race) same-hour on the same data.
# Run in the background; logs to /tmp/r5_bench/.
set -u
LOG=/tmp/r5_bench
mkdir -p $LOG
cd /root/repo

run() {  # name, dir, extra-env..., then command
  local name=$1; shift
  local dir=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a $LOG/campaign.log
  (cd "$dir" && timeout 3600 env "$@" ) >$LOG/$name.out 2>$LOG/$name.err
  echo "=== $name rc=$? end $(date +%T) ===" | tee -a $LOG/campaign.log
}

# --- config[1]: 100 x 2 Mbp, k31 S16, -M binary ---------------------------
# r5 timing series (3 fresh-process reps; code pinned in /tmp/r5race)
run c1_r5 /tmp/r5race python benchmarks/e2e_100.py 3
# r4 same-hour race on the SAME generated data
run c1_r4 /tmp/r4race python benchmarks/e2e_100.py 3
# r5 profiled run (per-phase split; stderr of the inner CLI is captured
# by e2e_100 only on failure, so run the CLI directly)
run c1_r5_prof /tmp/r5race env DASHING_TPU_METRICS=1 \
    python -m dashing_tpu.cli dist -k 31 -S 16 -M -b \
    -O /tmp/dtpu_e2e_100x2000000/dist.bin \
    -F /tmp/dtpu_e2e_100x2000000/fofn.txt --avoid-sorting

# --- config[3]: 1000 x 200 kbp, k21 S14, -M binary ------------------------
E3="DTPU_E2E_N=1000 DTPU_E2E_LEN=200000 DTPU_E2E_S=14 DTPU_E2E_K=21"
run c3_r5 /tmp/r5race env $E3 python benchmarks/e2e_100.py 3
run c3_r4 /tmp/r4race env $E3 python benchmarks/e2e_100.py 3
run c3_r5_prof /tmp/r5race env DASHING_TPU_METRICS=1 \
    python -m dashing_tpu.cli dist -k 21 -S 14 -M -b \
    -O /tmp/dtpu_e2e_1000x200000/dist.bin \
    -F /tmp/dtpu_e2e_1000x200000/fofn.txt --avoid-sorting
# -J (joint MLE) variant, r5 only
run c3_r5_J /tmp/r5race env $E3 DTPU_E2E_FLAGS=-J python benchmarks/e2e_100.py 2

echo "CAMPAIGN DONE $(date +%T)" | tee -a $LOG/campaign.log
