#!/bin/bash
# Round-4 TPU queue, phase 6: dots A/B (the branch-flip question), then
# bunny continuation segments with the remaining clock.
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue6.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

q timeout 1800 python scripts/r4_dots_ab.py

for i in 1 2 3; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_bunny_w48_cont \
    resume=outputs/heat_bunny_w48_cont/checkpoints
done
echo "=== QUEUE6 DONE $(date +%H:%M:%S)" >> "$LOG"
