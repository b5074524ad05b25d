#!/bin/bash
# Run a heavy command without contaminating scaling attempts:
#   scripts/with_busy.sh python -m pytest tests/ -x -q
# 1. raises /tmp/builder_busy so scripts/scaling_hunt.sh starts no new
#    attempt, 2. waits for any IN-FLIGHT attempt to finish (builder CPU
#    load during an attempt's timed iteration would slow the engine
#    without registering as hypervisor steal — i.e. silently corrupt a
#    "clean" measurement), 3. runs the command, 4. lowers the marker.
set -u
touch /tmp/builder_busy
trap 'rm -f /tmp/builder_busy' EXIT
for i in $(seq 1 60); do
  if ! pgrep -f "scaling_attempt.py|--flagship-worker" > /dev/null; then
    break
  fi
  sleep 10
done
"$@"
