#!/bin/bash
# Round-5 campaign phase 2: waits for phase 1 (r5_e2e_campaign.sh) to
# finish, then runs config[2] FASTQ, the mkdist bank A/B, and the
# update-matmul A/B on the TPU.  Code is pinned in a fresh worktree at
# start time so ongoing edits in /root/repo cannot skew mid-run.
# Logs to /tmp/r5_bench/.
set -u
LOG=/tmp/r5_bench
mkdir -p $LOG

# wait for phase 1 (max 3 h)
for i in $(seq 1 1080); do
  grep -q "CAMPAIGN DONE" $LOG/campaign.log 2>/dev/null && break
  sleep 10
done

WT=/tmp/r5b
git -C /root/repo worktree remove --force $WT 2>/dev/null
git -C /root/repo worktree add $WT HEAD >/dev/null 2>&1
make -C $WT/native >/dev/null 2>&1
export DTPU_REPO=$WT
cd $WT

run() {
  local name=$1; shift
  echo "=== $name start $(date +%T) ===" | tee -a $LOG/phase2.log
  timeout 4000 env "$@" >$LOG/$name.out 2>$LOG/$name.err
  echo "=== $name rc=$? end $(date +%T) ===" | tee -a $LOG/phase2.log
}

run fq_e2e python benchmarks/fastq_e2e.py 2
run fq_e2e_stream env DTPU_FQ_STREAM=1 python benchmarks/fastq_e2e.py 1
run mkdist_ab python benchmarks/mkdist_bank_ab.py 3
run update_matmul python benchmarks/update_matmul_ab.py

echo "PHASE2 DONE $(date +%T)" | tee -a $LOG/phase2.log
