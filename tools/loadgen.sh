#!/bin/bash
# Deliberate load generator for validating Bench's sentinel
# normalization (verdict r16 #2): reproduce the two ambient-window
# axes on demand so a LOADED capture on unchanged code can be checked
# against a quiet capture without waiting for a real host window.
#
#   tools/loadgen.sh io   <seconds>   # IO/page-cache pressure: parallel
#                                     # writers + re-readers over /tmp
#   tools/loadgen.sh cpu  <seconds>   # core contention: spin threads
#   tools/loadgen.sh both <seconds>
#
# Dev tooling only — never part of the engine. Cleans up its temp files
# and kills its workers on exit.
set -u
MODE=${1:-io}
SECS=${2:-120}
END=$(( $(date +%s) + SECS ))
DIR=$(mktemp -d /tmp/graft-loadgen.XXXXXX)
PIDS=()

cleanup() { kill "${PIDS[@]}" 2>/dev/null; wait 2>/dev/null; rm -rf "$DIR"; }
trap cleanup EXIT

io_worker() {
  local f="$DIR/blob$1"
  while [ "$(date +%s)" -lt "$END" ]; do
    dd if=/dev/zero of="$f" bs=1M count=512 conv=fsync 2>/dev/null
    cat "$f" > /dev/null 2>&1
    rm -f "$f"
  done
}

cpu_worker() {
  while [ "$(date +%s)" -lt "$END" ]; do :; done
}

case "$MODE" in
  io)   for i in 1 2 3 4 5 6; do io_worker "$i" & PIDS+=($!); done ;;
  cpu)  for i in $(seq 1 16); do cpu_worker & PIDS+=($!); done ;;
  both) for i in 1 2 3 4; do io_worker "$i" & PIDS+=($!); done
        for i in $(seq 1 8); do cpu_worker & PIDS+=($!); done ;;
  *) echo "usage: $0 io|cpu|both [seconds]" >&2; exit 2 ;;
esac
wait
