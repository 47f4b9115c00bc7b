#!/bin/bash
# Round-5 TPU queue, phase 4 (chains after queue3's QUEUE3 DONE marker).
#   1) h2 armadillo 399->639 (the critical path for VERDICT item 1)
#   2) kernel gate (stacked w48 fused kernel touched in bbec305)
#   3) w48 forward A/B (VERDICT item 6: construction attack, measure)
#   4) h2 checkpoint benchmark at e639
#   5) h2 639->799
#   6) rebound-detector calibration probe (real chip)
#   7) armadillo h1 device-row regen (escalation chain live; VERDICT item 4)
#   8) h2 final benchmark CSV
# Stop-file: output/r5_stop_h2 skips remaining h2 segments.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue4.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

while ! grep -q "QUEUE3 DONE" output/r5_queue3.log 2>/dev/null; do
  sleep 30
done

h2seg() {
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=40 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
}

# 1) h2 -> 639
for i in 1 2 3; do
  [ -f output/r5_stop_h2 ] && break
  h2seg
done

# 2) kernel gate
q timeout 1500 python scripts/tpu_kernel_gate.py

# 3) w48 forward A/B
q timeout 1800 python scripts/r5_w48_fwd_ab.py

# 4) h2 checkpoint benchmark at ~e639
q timeout 3600 python -m tpu_spai.cli.infer exp_name=stretch_armadillo4_h2 \
  data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
  workspace=scaled gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/stretch_armadillo4_h2b/checkpoints max_samples=2 \
  repeat=1 warmup=1 infer_prefix=e639_ out_dir=output/stretch_armadillo4_h2b

# 5) h2 -> 799
for i in 1 2; do
  [ -f output/r5_stop_h2 ] && break
  h2seg
done

# 6) rebound probe calibration
q timeout 1800 python scripts/r5_rebound_probe.py

# 7) armadillo h1 regen: full host menu, device rows ride the new
#    escalation chain (f32->ds_a->ds). Overwrites the bad-branch CSV.
q timeout 5400 python -m tpu_spai.cli.infer exp_name=stretch_armadillo4 \
  data.prefix=generated/stretch_armadillo4 \
  data.block_size=3 workspace=scaled gnn_features=48 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo4/checkpoints max_samples=2 repeat=1 \
  warmup=1 out_dir=output/stretch_armadillo4

# 8) h2 final benchmark CSV (the committed deliverable)
q timeout 5400 python -m tpu_spai.cli.infer exp_name=stretch_armadillo4_h2 \
  data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
  workspace=scaled gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/stretch_armadillo4_h2b/checkpoints max_samples=4 \
  repeat=2 warmup=1 out_dir=output/stretch_armadillo4_h2b

echo "=== QUEUE4 DONE $(date +%H:%M:%S)" >> "$LOG"
