#!/bin/bash
# Round-3 continuation: finish the heat_bunny w48 run to the FULL
# 800-epoch winning-recipe budget (docs/PERF.md round-3 ledger: the
# 480-epoch budget-tuned run halved the FSAI gap, 212 -> 162, but the
# coefficient-contrast bunny family needs the whole schedule).
#
# Schedule note: the committed epoch_0479 checkpoint ran gamma=0.9955
# (rescaled so LR(480) matches the winning recipe's LR(800)). Resuming
# with gamma=0.9975 puts the restored epoch counter exactly on the
# winning 800-epoch schedule's own segment: LR(480)=0.30*lr0 ->
# LR(800)=0.135*lr0 — a mild warm restart (0.115 -> 0.30) followed by
# the recipe's genuine tail, rather than decaying 5x below it.
#
# Crash-robust segments (relay RSS leak, CLAUDE.md): 80 epochs/run,
# checkpoint every 20, no mid-run device validation.
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_queue4.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

for i in 1 2 3 4; do
  q timeout 1500 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_bunny_w48 \
    resume=outputs/heat_bunny_w48/checkpoints
done
echo "=== queue4 done $(date +%H:%M:%S)" >> "$LOG"
