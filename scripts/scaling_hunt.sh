#!/bin/bash
# Hunt for clean scaling windows all round: one attempt per iteration,
# short window budget (the probe gate skips bad windows cheaply), stop
# after enough clean attempts or when killed. Round 5: alternates the
# flagship job with the shuffle-heavy job (ExactSubstr — bench.py
# shuffle_pipeline) so BOTH scaling blocks accumulate clean evidence;
# the job arg only changes WHICH measurement runs, never its gates.
# Defers to the builder's own heavy runs via per-PID markers in
# /tmp/builder_busy.d (see scripts/with_busy.sh); markers whose PID is
# dead are pruned so a crashed builder session cannot pause the hunt
# forever.
cd /root/repo
CLEAN_FLAG=0
CLEAN_SHUF=0
for i in $(seq 1 400); do
  while :; do
    for m in /tmp/builder_busy.d/*; do
      [ -e "$m" ] || continue
      kill -0 "$(basename "$m")" 2>/dev/null || rm -f "$m"
    done
    [ -e /tmp/builder_busy ] && { sleep 20; continue; }
    [ -n "$(ls -A /tmp/builder_busy.d 2>/dev/null)" ] && { sleep 20; continue; }
    break
  done
  # prioritize the job with less clean evidence; shuffle first (new)
  if [ $CLEAN_SHUF -lt 30 ]; then JOB=shuffle; else JOB=flagship; fi
  python scripts/scaling_attempt.py 120 $JOB >> /tmp/scaling_hunt.log 2>&1
  rc=$?
  echo "iter=$i job=$JOB rc=$rc $(date -u +%H:%M:%S)" >> /tmp/scaling_hunt.log
  if [ $rc -eq 0 ]; then
    if [ "$JOB" = shuffle ]; then CLEAN_SHUF=$((CLEAN_SHUF+1)); else CLEAN_FLAG=$((CLEAN_FLAG+1)); fi
  fi
  if [ $CLEAN_SHUF -ge 30 ] && [ $CLEAN_FLAG -ge 6 ]; then
    echo "hunt done: shuffle=$CLEAN_SHUF flagship=$CLEAN_FLAG clean" >> /tmp/scaling_hunt.log; break
  fi
  sleep 30
done
