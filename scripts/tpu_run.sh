#!/bin/bash
# Run a python script on the TPU, waiting until no other python process
# holds the tunnel (concurrent TPU processes serialize and appear hung).
set -u
LOG="${2:-/tmp/tpu_run.log}"
for i in $(seq 1 120); do
    busy=$(ps aux | grep -E "[p]ython (-u )?/tmp/|[p]ython (-u )?bench" | wc -l)
    [ "$busy" -eq 0 ] && break
    sleep 5
done
exec timeout "${3:-560}" python -u "$1" > "$LOG" 2>&1
