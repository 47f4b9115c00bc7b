#!/bin/bash
# Round-5 extension queue: continue the res=36 model toward its full
# budget (epoch 39 -> 300; the 40-epoch snapshot measured WORSE than
# the 500-epoch OOD model, 395 vs 217 iters), interleaved with the
# armadillo h2b continuation. Stop-files as in queue8.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue9.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

r36seg() {
  q timeout 2100 python -m tpu_spai.cli.train exp_name=heat_r36 \
    scheduler.params.gamma=0.995 \
    trainer.max_epochs=300 trainer.epochs_per_run=60 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/heat_r36 resume=outputs/heat_r36/checkpoints
}

h2seg() {
  q timeout 1800 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=80 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
}

stop() { [ -f output/r5_stop_all ]; }

for i in 1 2 3; do
  stop || { [ -f output/r5_stop_r36 ] || r36seg; }
done
stop || { [ -f output/r5_stop_h2 ] || h2seg; }
for i in 1 2; do
  stop || { [ -f output/r5_stop_r36 ] || r36seg; }
done
stop || { [ -f output/r5_stop_h2 ] || h2seg; }

echo "=== QUEUE9 DONE $(date +%H:%M:%S)" >> "$LOG"
