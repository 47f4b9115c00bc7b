#!/bin/bash
# Round-3 TPU session A: measurement batch after the armadillo training
# drains. Serialized; the crash-prone probes run LAST so a worker fault
# cannot poison the measurements.
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_sessionA.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) roofline session sample (VERDICT item 5 multi-session spread)
q timeout 900 python scripts/spmv_roofline.py \
  --out output/roofline/session_r3a.json

# 2) kernel gate (slotted/construct path changed this round)
q timeout 1500 python scripts/tpu_kernel_gate.py

# 3) construction + iteration decomposition AFTER the fixes
q timeout 1800 python scripts/r3_prec_profile.py

# 4) nn.scan training-step A/B at the 1.57M-edge bucket
q timeout 1800 python scripts/r3_scan_step_ab.py

# 5) benchmark with the fused path
q timeout 2700 python bench.py

# 6) armadillo parity rows — host-safe pass first (no windowed device
#    solves; the b=3 gsel solve at this scale faults the worker)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=stretch_armadillo \
  data.block_size=3 workspace=scaled use_windowed=false \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/stretch_armadillo

# 7) crash isolation LAST (may take the worker down for minutes)
q timeout 1200 python scripts/r3_b3_crash_probe.py

echo "=== SESSION A DONE $(date +%H:%M:%S)" >> "$LOG"
