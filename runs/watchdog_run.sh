#!/bin/bash
# watchdog_run.sh <max_s> <stall_s> <logfile> <cmd...>
# Runs cmd appending to logfile; kills and retries (up to 4 attempts) if the
# log stops growing for stall_s (the axon claim-leg wedge shows as a silent
# process), or if cmd exceeds max_s.  Exits 0 on cmd success.
MAX=$1; STALL=$2; LOG=$3; shift 3
for attempt in 1 2 3 4; do
  echo "[watchdog] attempt $attempt: $* ($(date -u))" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  START=$(date +%s)
  LAST_SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
  LAST_GROW=$START
  while kill -0 $PID 2>/dev/null; do
    sleep 15
    NOW=$(date +%s)
    SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$SIZE" != "$LAST_SIZE" ]; then LAST_SIZE=$SIZE; LAST_GROW=$NOW; fi
    if [ $((NOW - LAST_GROW)) -gt "$STALL" ]; then
      echo "[watchdog] stalled ${STALL}s, killing $PID ($(date -u))" >> "$LOG"
      kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
      break
    fi
    if [ $((NOW - START)) -gt "$MAX" ]; then
      echo "[watchdog] exceeded ${MAX}s, killing $PID ($(date -u))" >> "$LOG"
      kill $PID 2>/dev/null; sleep 3; kill -9 $PID 2>/dev/null
      wait $PID 2>/dev/null
      exit 124
    fi
  done
  wait $PID 2>/dev/null
  RC=$?
  echo "[watchdog] attempt $attempt rc=$RC ($(date -u))" >> "$LOG"
  [ $RC -eq 0 ] && exit 0
  sleep 45
done
exit 1
