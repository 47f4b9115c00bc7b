#!/bin/bash
# Round-5 continuation queue, phase 7 (chains after queue6's marker):
# the two missing trained models, interleaved so both progress —
#   r36: in-distribution res=36 heat model (VERDICT item 5; bench.py
#        prefers outputs/heat_r36/checkpoints for the big e2e case)
#   h2b: armadillo on the reference's time_step=0.002 operator
#        (VERDICT item 1; resumes from epoch 79)
# Stop-files: output/r5_stop_r36 / output/r5_stop_h2 skip further
# segments of that model. Cutoff guards the tail.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue7.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

while ! grep -q "QUEUE6 DONE" output/r5_queue6.log 2>/dev/null; do
  sleep 30
done

r36seg() {
  q timeout 2400 python -m tpu_spai.cli.train exp_name=heat_r36 \
    scheduler.params.gamma=0.995 \
    trainer.max_epochs=300 trainer.epochs_per_run=60 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/heat_r36 resume=outputs/heat_r36/checkpoints
}

h2seg() {
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=40 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
}

CUTOFF=$(date -d "09:05" +%s 2>/dev/null || echo 0)
guard() { [ "$(date +%s)" -lt "$CUTOFF" ]; }

[ -f output/r5_stop_r36 ] || r36seg
[ -f output/r5_stop_r36 ] || r36seg
[ -f output/r5_stop_h2 ] || h2seg
guard && { [ -f output/r5_stop_r36 ] || r36seg; }
guard && { [ -f output/r5_stop_h2 ] || h2seg; }
guard && { [ -f output/r5_stop_h2 ] || h2seg; }
guard && { [ -f output/r5_stop_h2 ] || h2seg; }

echo "=== QUEUE7 DONE $(date +%H:%M:%S)" >> "$LOG"
