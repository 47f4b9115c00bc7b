#!/bin/bash
# Round-4 TPU queue, phase 4 (runs after queue3's armadillo training):
# armadillo benchmark, bunny 480->800 continuation with the FIXED
# params-only resume (ADVICE r3: the round-3 continuation regression was
# the Adam bias-correction bug, so the budget hypothesis is untested),
# refreshed w48 benchmark CSVs (gsel expansion + scalar-fetch timing),
# re-gate, step-profile re-run (DCE fix), bench rehearsal.
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue4.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# serialize behind queue3
while ! grep -q "QUEUE3 DONE" output/r4_queue3.log 2>/dev/null; do
  sleep 30
done

# 1) armadillo 4-region benchmark (host fp64 oracle + device rows)
q timeout 5400 python -m tpu_spai.cli.infer exp_name=stretch_armadillo4 \
  data.prefix=generated/stretch_armadillo4 \
  data.block_size=3 workspace=scaled gnn_features=48 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo4/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/stretch_armadillo4

# 2) bunny continuation 480->800 on the winning schedule tail,
#    fixed params-only resume (fresh Adam moments, schedule-only
#    fast-forward) — VERDICT item 7 budget hypothesis
for i in 1 2 3 4 5 6; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_bunny_w48_cont \
    resume=outputs/heat_bunny_w48_cont/checkpoints
done

# 3) refreshed flagship w48 CSV (gsel expansion + scalar-fetch timing)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  gnn_features=48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48

# 4) bunny continuation benchmark (best-of epochs handled by sweep later)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/heat_bunny_w48_cont/checkpoints max_samples=4 \
  repeat=2 warmup=1 out_dir=output/heat_bunny_w48_cont

# 5) kernel gate (application-level w48 referee)
q timeout 1800 python scripts/tpu_kernel_gate.py

# 6) step profile re-run (grad chain DCE fix)
q timeout 2400 python scripts/r4_step_profile.py

# 7) bench rehearsal (the driver runs its own at round end)
q timeout 1800 python bench.py

echo "=== QUEUE4 DONE $(date +%H:%M:%S)" >> "$LOG"
