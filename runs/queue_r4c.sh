#!/bin/bash
# Round-4 straggler queue: checkpoint-resume anything a timeout or an axon
# RPC hang (see README "MC checkpoint/resume") cut short.  Each invocation
# resumes from its JSON checkpoint / phase artifacts, so retries only
# repeat <=60 s of work.
cd /root/repo
Q=runs/queue_r4.log
while ! grep -q "QUEUE_R4B DONE" $Q 2>/dev/null; do sleep 60; done
say() { echo "=== $1 $(date -u)" >> $Q; }
rc() { echo "$1 rc=$2 $(date -u)" >> $Q; }

# finish phi=accurate nG=5 p=0.04 (p=0.05 complete in the checkpoint)
for i in 1 2; do
  say "q job7.$i resume phi=accurate nG=5 p=0.05,0.04"
  FGT_PHI_IMPL=accurate timeout 1500 python scripts/evaluate.py -c n882 -nG 5 \
    -p 0.05 0.04 -bs 20480 --qc-kernel --compact 0.1 --rounds-cap 0.05 \
    --target-errors 100 --max-mc-iter 4883 --seed 22 \
    --checkpoint runs/ckpt_phi_acc_nG5.json \
    >> runs/n882_nG5_p0504_phi_accurate.log 2>&1
  r=$?
  rc job7.$i $r
  [ $r -eq 0 ] && break
done

# if the from-scratch run did not reach "done", resume it (phase artifacts)
if ! grep -q "^\[..:..:..\] done" runs/train_scratch2.log 2>/dev/null; then
  say "q job8 resume train_from_scratch v2"
  timeout 7200 python scripts/train_from_scratch.py -c n882 \
    --out-dir runs/scratch2 --eval-batch 20480 \
    >> runs/train_scratch2.log 2>&1
  rc job8 $?
fi

# finish any OSD row that missed its target (checkpoints resume)
for i in 1 2; do
  say "q job9.$i resume bp2-osd p=0.04"
  timeout 2100 python examples/osd_eval.py --mode bp2-osd -p 0.04 -bs 32768 \
    --osd-cap 1024 --target-errors 80 --max-mc-iter 200 --seed 31 \
    --checkpoint runs/ckpt_osd_bp2_p04.json >> runs/osd_bp2_p04_s31.log 2>&1
  r=$?
  rc job9.$i $r
  [ $r -eq 0 ] && break
done

echo "QUEUE_R4C DONE $(date -u)" >> $Q
