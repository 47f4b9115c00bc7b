#!/bin/bash
# Round-5 TPU queue, phase 5 (chains after queue4): in-distribution
# res=36 heat model (VERDICT item 5) with whatever clock remains, then
# the bench.py rehearsal (validates the round-5 bench edits on-chip).
# Time guard: no new training segment after the cutoff; bench always runs.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
LOG=output/r5_queue5.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

while ! grep -q "QUEUE4 DONE" output/r5_queue4.log 2>/dev/null; do
  sleep 30
done

CUTOFF=$(date -d "09:10" +%s 2>/dev/null || echo 0)

for i in 1 2 3 4 5; do
  [ -f output/r5_stop_r36 ] && break
  [ "$(date +%s)" -ge "$CUTOFF" ] && break
  q timeout 1800 python -m tpu_spai.cli.train exp_name=heat_r36 \
    scheduler.params.gamma=0.995 \
    trainer.max_epochs=300 trainer.epochs_per_run=60 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/heat_r36 resume=outputs/heat_r36/checkpoints
done

q timeout 1500 python bench.py

echo "=== QUEUE5 DONE $(date +%H:%M:%S)" >> "$LOG"
