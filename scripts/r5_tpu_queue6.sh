#!/bin/bash
# Round-5 continuation queue, phase 6 (fresh session; queues 4/5 never
# ran). Validation first — the stacked w48 kernel (bbec305), the
# escalation chain (4e2b190), and the round-5 bench edits have never
# touched the real chip:
#   1) kernel gate
#   2) w48 forward A/B (VERDICT item 6 measurement)
#   3) bench.py rehearsal (OOD fallback path; validates honest roofline)
# Training segments are launched adaptively by the session after this.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue6.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

q timeout 1500 python scripts/tpu_kernel_gate.py
q timeout 1800 python scripts/r5_w48_fwd_ab.py
q timeout 1500 python bench.py

echo "=== QUEUE6 DONE $(date +%H:%M:%S)" >> "$LOG"
