#!/bin/bash
# Run a heavy command without contaminating scaling attempts:
#   scripts/with_busy.sh python -m pytest tests/ -x -q
# 1. drops a per-PID marker in /tmp/builder_busy.d/ so
#    scripts/scaling_hunt.sh starts no new attempt (per-PID: several
#    concurrent heavy jobs must EACH hold the gate — a shared single
#    marker is removed by whichever job exits first), 2. waits for any
#    IN-FLIGHT attempt to finish (builder CPU load during an attempt's
#    timed iteration would slow the engine without registering as
#    hypervisor steal — i.e. silently corrupt a "clean" measurement),
#    3. runs the command, 4. removes its marker.
set -u
mkdir -p /tmp/builder_busy.d
touch "/tmp/builder_busy.d/$$"
trap 'rm -f "/tmp/builder_busy.d/$$"' EXIT
for i in $(seq 1 120); do
  if ! pgrep -f "scaling_attempt.py|--flagship-worker|--shuffle-worker" > /dev/null; then
    break
  fi
  sleep 10
done
"$@"
