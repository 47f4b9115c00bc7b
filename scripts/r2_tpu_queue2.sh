#!/bin/bash
# Round-2 TPU queue, phase 2 (run after r2_tpu_queue.sh drains):
# heat_bunny recovery (lost to the resume crash), stretch_armadillo
# (block 3, scaled ws, real armadillo geometry), the rds re-measure with
# the compensated ds_dot, and the final benchmark.
set -u
cd "$(dirname "$0")/.."
LOG=output/r2_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) heat_bunny: reference geometry (datagen/heat.py:46-47), 300 epochs
for i in 1 2 3 4 5 6; do
  q timeout 2400 python -m tpu_spai.cli.train exp_name=heat_bunny \
    trainer.max_epochs=300 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=10 \
    'check_methods=[none]' \
    output_dir=outputs/heat_bunny resume=outputs/heat_bunny/checkpoints
done

# 2) bunny parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_bunny/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_bunny

# 3) stretch_armadillo, 200 epochs (block_size=3, scaled workspace)
for i in 1 2 3 4; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo \
    data.block_size=3 workspace=scaled \
    trainer.max_epochs=200 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=10 \
    'check_methods=[none]' \
    output_dir=outputs/stretch_armadillo \
    resume=outputs/stretch_armadillo/checkpoints
done

# 4) armadillo parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=stretch_armadillo \
  data.block_size=3 workspace=scaled \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/stretch_armadillo

# 5) rds tier re-measure with the compensated ds_dot
q timeout 2700 python scripts/rds_study.py tpu=1 max_samples=2 \
  out=output/rds_study_tpu2.csv

# 6) final benchmark artifact
q timeout 2700 python bench.py

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
