#!/bin/bash
# 22.05 kHz knee sweep (round-3 verdict item 1): re-run the bench knees
# at the reference's canonical rate. One config at a time on the real
# chip; results append to /tmp/sweep22k.log. The persistent compile
# cache makes repeat shapes cheap; new (B, cap, GC) combos pay a remote
# compile (~minutes) once.
set -u
cd /root/repo
LOG=/tmp/sweep22k.log
run() {
  local tag="$1"; shift
  echo "== $tag $(date +%H:%M:%S)" >> "$LOG"
  env "$@" SPEEDY_BENCH_SR=22050 timeout 2400 python bench.py >> "$LOG" 2>&1
  echo "exit=$?" >> "$LOG"
}
# 1. reproduce the recorded point (B=128, cap 1.33, GC=64)
run base
# 2. pitch GC=32: exactly 288 cells at 22.05 kHz (GC=64 rounds to 320,
#    +11% dead pitch work)
run gc32 SPEEDY_PITCH_GC=32
# 3. batch knee at the better GC (filled in by hand after step 2)
