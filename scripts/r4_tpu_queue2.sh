#!/bin/bash
# Round-4 TPU queue, phase 2: re-gate after the ds_add fix, precision +
# step-decomposition probes, construction profiles (flagship w48 and the
# n=50k case), then the 4-region armadillo w48-scaled training.
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) kernel gate (ds_add semantics changed; w48 checks under review)
q timeout 1800 python scripts/tpu_kernel_gate.py

# 2) w48 on-chip precision probe (gate-tolerance decision data)
q timeout 900 python scripts/r4_w48_prec_probe.py

# 3) training-step decomposition (VERDICT item 6)
q timeout 2400 python scripts/r4_step_profile.py

# 4) n=50k construction profile (VERDICT item 3)
q env PREC_PROFILE_OUT=output/r4_prec50k_profile.json \
  timeout 2400 python scripts/r3_prec_profile.py \
  data.prefix=output/bench_heat_r36

# 5) flagship w48 construction + iteration profile (the new headline)
q env PREC_PROFILE_OUT=output/r4_prec_w48_profile.json \
  timeout 2400 python scripts/r3_prec_profile.py \
  gnn_features=48 pretrained=outputs/heat_r20_w48/checkpoints

# 6) 4-region armadillo, w48 + scaled workspace (VERDICT item 2).
#    gamma budget-matched to the 800-epoch 0.9975 recipe at 120 epochs
#    (0.985^120 ~ 0.9975^800 ~ 0.15 of lr0); crash-robust segments.
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

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
