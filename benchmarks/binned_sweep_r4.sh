#!/bin/bash
# Round-4 schedule sweep for binned traversal at 1M random rays x 1M tris.
# Each leg is a subprocess (module knobs are import-time). ~4 min compile
# per new config; results append to /tmp/sweep_r4.log.
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ===" >> /tmp/sweep_r4.log
  env "$@" ECHO_BT_NLOG2=20 timeout 580 python benchmarks/binned_profile.py 2>/dev/null | tail -4 >> /tmp/sweep_r4.log
}
run ECHO_BT_K=4 ECHO_BT_KS=32                                  # A baseline
run ECHO_BT_K=4 ECHO_BT_KS=32 ECHO_BT_KSUP=2                   # B narrow buffer
run ECHO_BT_K=3 ECHO_BT_KS=32                                  # C k=3
run ECHO_BT_K=4 ECHO_BT_KS=32 ECHO_BT_MID_K=8 ECHO_BT_MID_ROUNDS=2  # D
run ECHO_BT_K=4 ECHO_BT_KS=32 ECHO_BT_FULL_ROUNDS=3 ECHO_BT_MID_FRACTION=16  # E
run ECHO_BT_K=4 ECHO_BT_KS=32 ECHO_BT_FINAL_FRACTION=128       # F
run ECHO_BT_K=6 ECHO_BT_KS=32 ECHO_BT_FULL_ROUNDS=1 ECHO_BT_MID_FRACTION=4  # G
echo "SWEEP DONE" >> /tmp/sweep_r4.log
