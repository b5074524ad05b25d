#!/bin/bash
# Hunt for clean scaling windows all round: one attempt per iteration,
# short window budget (the probe gate skips bad windows cheaply), stop
# after 5 clean attempts or when killed. Defers to the builder's own
# heavy runs via the /tmp/builder_busy marker.
cd /root/repo
CLEAN=0
for i in $(seq 1 400); do
  while [ -e /tmp/builder_busy ]; do sleep 20; done
  python scripts/scaling_attempt.py 120 >> /tmp/scaling_hunt.log 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then CLEAN=$((CLEAN+1)); fi
  if [ $CLEAN -ge 5 ]; then echo "hunt done: $CLEAN clean" >> /tmp/scaling_hunt.log; break; fi
  sleep 30
done
