#!/bin/bash
# Round-5 final-session TPU queue (serialized; queues 4-7 never ran).
#   1) kernel gate       — round-5 kernels (stacked w48, escalation) have
#                          never touched the real chip
#   2) bench rehearsal   — validates the round-5 bench edits on-chip
#   3) w48 fwd A/B       — stacked3/stacked1 only (base+stacked measured
#                          nothing last time: compile churn timeout)
#   4) r36 seg1          — in-distribution res=36 model (VERDICT item 5;
#                          bench.py prefers outputs/heat_r36/checkpoints)
#   5) h2b seg           — armadillo on the reference operator, resumes
#                          from epoch 79 (VERDICT item 1)
#   6) more segments while the clock allows
# Stop-files: output/r5_stop_r36 / output/r5_stop_h2 / output/r5_stop_all
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue8.log
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

q timeout 1200 python scripts/tpu_kernel_gate.py
stop || q timeout 1500 python bench.py
stop || q env R5_AB_ONLY=stacked3,stacked1 timeout 2100 python scripts/r5_w48_fwd_ab.py
stop || { [ -f output/r5_stop_r36 ] || r36seg; }
stop || { [ -f output/r5_stop_h2 ] || h2seg; }
stop || { [ -f output/r5_stop_r36 ] || r36seg; }
stop || { [ -f output/r5_stop_h2 ] || h2seg; }
stop || { [ -f output/r5_stop_r36 ] || r36seg; }

echo "=== QUEUE8 DONE $(date +%H:%M:%S)" >> "$LOG"
