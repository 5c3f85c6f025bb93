#!/bin/bash
# Watchdog + retry wrapper for TPU jobs over the axon tunnel.
#
# The tunnel's first big program submission intermittently wedges (the
# process sleeps forever on the remote call; the device itself stays
# healthy for other processes). Mitigation: kill the exact child when its
# log stops growing for STALL_S seconds and relaunch — a fresh process gets
# a fresh connection and (in every observed case) proceeds normally.
#
# Usage: tools/tpu_retry.sh <logfile> <stall_seconds> <max_tries> <cmd...>
set -u
LOG="$1"; STALL="$2"; TRIES="$3"; shift 3

for attempt in $(seq 1 "$TRIES"); do
  : > "$LOG"
  "$@" >> "$LOG" 2>&1 &
  pid=$!
  last_size=-1
  stall_t0=$(date +%s)
  while kill -0 "$pid" 2>/dev/null; do
    sleep 10
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    now=$(date +%s)
    if [ "$size" != "$last_size" ]; then
      last_size=$size
      stall_t0=$now
    elif [ $((now - stall_t0)) -ge "$STALL" ]; then
      echo "[tpu_retry] attempt $attempt stalled ${STALL}s; killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null
      sleep 3
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  if wait "$pid" 2>/dev/null; then
    echo "[tpu_retry] attempt $attempt succeeded" >> "$LOG"
    exit 0
  fi
  echo "[tpu_retry] attempt $attempt failed; $((TRIES - attempt)) retries left" >> "$LOG"
done
exit 1
