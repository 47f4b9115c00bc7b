#!/bin/bash
# Round-3 TPU queue, phase 1: finish stretch_armadillo (VERDICT item 4)
# — resume epoch 49 -> 200 in crash-robust segments, then its parity
# rows. Serialized: ONE process on the TPU at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_queue1.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) stretch_armadillo to 200 epochs (block_size=3, scaled workspace)
for i in 1 2 3 4; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo \
    data.block_size=3 workspace=scaled \
    trainer.max_epochs=200 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=10 \
    'check_methods=[none]' \
    output_dir=outputs/stretch_armadillo \
    resume=outputs/stretch_armadillo/checkpoints
done

# 2) armadillo parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=stretch_armadillo \
  data.block_size=3 workspace=scaled \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/stretch_armadillo/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/stretch_armadillo

echo "=== QUEUE1 DONE $(date +%H:%M:%S)" >> "$LOG"
