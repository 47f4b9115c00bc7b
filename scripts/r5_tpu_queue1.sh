#!/bin/bash
# Round-5 TPU queue, phase 1: stretch_armadillo4_h2 trained FOR REAL
# (VERDICT r4 item 1). Fresh run at the bunny-winning recipe: w48 +
# scaled workspace, gamma=0.9975 (the r4 run's 0.985 collapsed the LR
# by epoch 120), 800-epoch budget in 80-epoch segments (relay RSS
# leak), REAL validation cadence (every 40 epochs — r4 flew blind at
# check_val_every_n_epoch=2000).
set -u
cd "$(dirname "$0")/.."
LOG=output/r5_queue1.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

for i in 1 2 3 4 5 6 7 8 9 10; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=40 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
done
echo "=== QUEUE1 DONE $(date +%H:%M:%S)" >> "$LOG"
