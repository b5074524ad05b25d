#!/bin/bash
# Hunt for clean scaling windows all round: one attempt per iteration,
# short window budget (the probe gate skips bad windows cheaply), stop
# after 5 clean attempts or when killed. Defers to the builder's own
# heavy runs via per-PID markers in /tmp/builder_busy.d (see
# scripts/with_busy.sh); markers whose PID is dead are pruned so a
# crashed builder session cannot pause the hunt forever.
cd /root/repo
CLEAN=0
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
  python scripts/scaling_attempt.py 120 >> /tmp/scaling_hunt.log 2>&1
  rc=$?
  echo "iter=$i rc=$rc $(date -u +%H:%M:%S)" >> /tmp/scaling_hunt.log
  if [ $rc -eq 0 ]; then CLEAN=$((CLEAN+1)); fi
  if [ $CLEAN -ge 5 ]; then echo "hunt done: $CLEAN clean" >> /tmp/scaling_hunt.log; break; fi
  sleep 30
done
