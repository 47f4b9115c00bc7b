#!/bin/bash
# Round-4 TPU queue, phase 3: wait out any running TPU job, then the
# fixed probes (w48 precision, step decomposition) and the 4-region
# armadillo w48-scaled training + benchmark.
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue3.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# serialize behind the still-running w48 profile (exact pid passed in $1)
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

q timeout 900 python scripts/r4_w48_prec_probe.py
q timeout 2400 python scripts/r4_step_profile.py

# 4-region armadillo, w48 + scaled workspace (VERDICT item 2)
for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4 \
    data.prefix=generated/stretch_armadillo4 \
    data.block_size=3 workspace=scaled \
    gnn_features=48 gnn.weight_init=torch scheduler.params.gamma=0.985 \
    trainer.max_epochs=120 trainer.epochs_per_run=10 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=10 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/stretch_armadillo4 \
    resume=outputs/stretch_armadillo4/checkpoints
done

echo "=== QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
