#!/bin/bash
# Round-3 TPU queue, phase 2 (VERDICT item 3: win the heat family):
# retrain heat_bunny and the heat_r20 flagship with the w48 / torch-init
# recipe. Budget-tuned: 480/400 epochs with the decay rescaled so the
# FINAL LR matches the winning 800-epoch gamma=0.9975 recipe
# (0.9955^480 ~ 0.9975^800 ~ 0.135e-3 of lr0). Crash-robust segments,
# no mid-run device validation.
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) heat_bunny w48 (reference geometry; the r2 16-wide model lost
#    212 vs FSAI 115.75)
for i in 1 2 3 4 5 6; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9955 gnn.weight_init=torch \
    trainer.max_epochs=480 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_bunny_w48 \
    resume=outputs/heat_bunny_w48/checkpoints
done

# 2) bunny parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_bunny_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_bunny_w48

# 3) heat_r20 flagship w48
for i in 1 2 3 4 5 6; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_r20 \
    gnn_features=48 scheduler.params.gamma=0.995 gnn.weight_init=torch \
    data.is_fixed_topology=true data.has_shared_features=true \
    data.use_node_features=true data.use_mask_as_node_feature=true \
    data.load_into_memory=true \
    trainer.max_epochs=400 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=20 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_r20_w48 \
    resume=outputs/heat_r20_w48/checkpoints
done

# 4) flagship parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  gnn_features=48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
