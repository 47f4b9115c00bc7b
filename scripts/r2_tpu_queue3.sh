#!/bin/bash
# Round-2 TPU queue, phase 3 (stretch goal, run only if time remains):
# fine-tune the 500-epoch flagship heat_r20 model at constant low LR —
# the exp(0.99) schedule starves late epochs (lr ~7e-6 by epoch 500);
# 200 extra epochs at 2e-4 tests whether the FSAI gap (109.75 vs 97.75)
# is an optimization artifact.
set -u
cd "$(dirname "$0")/.."
LOG=output/r2_queue3.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

for i in 1 2 3 4; do
  q timeout 2400 python -m tpu_spai.cli.train exp_name=heat_r20 \
    pretrained=outputs/heat_r20_v2/checkpoints \
    optimizer.params.lr=2e-4 scheduler.name=none \
    trainer.max_epochs=200 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=200 checkpoint.every_n_epochs=10 \
    'check_methods=[none]' \
    output_dir=outputs/heat_r20_v4 resume=outputs/heat_r20_v4/checkpoints
done

q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_v4/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_v4

echo "=== QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
