#!/bin/bash
# Retry wrapper for flaky tunneled-TPU runs: respawns the command until it
# exits 0, up to $TRIES attempts (default 8). The python side should have a
# startup watchdog (see bench.py _ensure_backend) so hangs fail fast.
TRIES=${TRIES:-8}
for i in $(seq 1 "$TRIES"); do
  "$@" && exit 0
  echo "[tpu_retry] attempt $i failed (rc=$?)" >&2
  sleep 5
done
exit 1
