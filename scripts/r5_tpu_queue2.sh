#!/bin/bash
# Round-5 TPU queue, phase 2: takes over from queue1's first segment.
# Interleaves the on-chip kernel gate (gnn/slotted sizing touched this
# round) and the rebound-detector calibration between h2 training
# segments; then more h2 segments. Stop-file: output/r5_stop_h2 breaks
# the h2 loop (checked between segments).
set -u
cd "$(dirname "$0")/.."
LOG=output/r5_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

h2seg() {
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=40 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
}

h2seg                                     # -> ~epoch 160
q timeout 1500 python scripts/tpu_kernel_gate.py
h2seg                                     # -> ~epoch 240
q timeout 1800 python scripts/r5_rebound_probe.py
for i in 1 2 3; do                        # -> ~epoch 480
  [ -f output/r5_stop_h2 ] && break
  h2seg
done
echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
