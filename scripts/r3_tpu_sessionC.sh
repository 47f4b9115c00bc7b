#!/bin/bash
# Round-3 TPU session C (run after r3_tpu_queue2.sh drains):
# - rds tier re-measure with the compensated ds_dot (VERDICT item 9)
# - device-IC A/B artifact (VERDICT item 6)
# - third roofline session sample (VERDICT item 5 spread)
# - final benchmark
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_sessionC.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# re-runs from session A (failed there on a path bootstrap bug)
q timeout 1800 python scripts/r3_prec_profile.py
q timeout 1800 python scripts/r3_scan_step_ab.py

q timeout 2700 python scripts/rds_study.py tpu=1 max_samples=4 \
  out=output/rds_study_tpu.csv

q timeout 1800 python scripts/ic_device_ab.py

q timeout 900 python scripts/spmv_roofline.py \
  --out output/roofline/session_r3c.json

q timeout 2700 python bench.py

# bunny w48 device rows (the first run predated the fused->pallas
# VMEM fallback; host rows are already in output/heat_bunny_w48)
q timeout 2400 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 'check_methods=[]' \
  pretrained=outputs/heat_bunny_w48/checkpoints max_samples=2 repeat=2 \
  warmup=1 out_dir=output/heat_bunny_w48_dev

# heat_r20 w48 device rows (same reason)
q timeout 2400 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  gnn_features=48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true 'check_methods=[]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=2 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48_dev

# armadillo device rows: the gsel/pallas path is crash-probe-verified at
# this scale (r3_sessionA.log probes all pass; only the legacy
# graph-form XLA path faults). use_windowed=true keeps the fallback off.
q timeout 5400 python -m tpu_spai.cli.infer exp_name=stretch_armadillo \
  data.block_size=3 workspace=scaled \
  'check_methods=[none,diagonal]' \
  pretrained=outputs/stretch_armadillo/checkpoints max_samples=2 repeat=1 \
  warmup=1 out_dir=output/stretch_armadillo_dev

echo "=== SESSION C DONE $(date +%H:%M:%S)" >> "$LOG"
