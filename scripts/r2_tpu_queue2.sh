#!/bin/bash
# Round-2 TPU queue, phase 2: stretch_armadillo (block_size=3, scaled
# workspace — the reference's stretch_armadillo.py family on the actual
# armadillo geometry) + the final benchmark artifacts.
set -u
cd "$(dirname "$0")/.."
LOG=output/r2_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# stretch_armadillo training, 200 epochs in 50-epoch segments
for i in 1 2 3 4; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo \
    data.block_size=3 workspace=scaled \
    trainer.max_epochs=200 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=50 \
    'check_methods=[none]' \
    output_dir=outputs/stretch_armadillo \
    resume=outputs/stretch_armadillo/checkpoints
done

# armadillo parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=stretch_armadillo \
  data.block_size=3 workspace=scaled \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/stretch_armadillo

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
