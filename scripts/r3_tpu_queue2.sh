#!/bin/bash
# Round-3 TPU queue, phase 2 (VERDICT item 3: win the heat family):
# retrain heat_bunny and the heat_r20 flagship with the proven
# w48 / gamma=0.9975 / torch-init / 800-epoch recipe (PARITY round-2
# recipe study), then their parity rows. Serialized, crash-robust
# segments, no mid-run device validation (the b=3-style worker faults).
set -u
cd "$(dirname "$0")/.."
LOG=output/r3_queue2.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

W48='gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch'

# 1) heat_bunny w48 (reference geometry; the r2 16-wide model lost
#    212 vs FSAI 115.75)
for i in 1 2 3 4 5 6 7 8; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    $W48 \
    trainer.max_epochs=800 trainer.epochs_per_run=100 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=25 \
    'check_methods=[none]' \
    output_dir=outputs/heat_bunny_w48 \
    resume=outputs/heat_bunny_w48/checkpoints
done

# 2) bunny parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  $W48 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_bunny_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_bunny_w48

# 3) heat_r20 flagship w48
for i in 1 2 3 4 5 6 7 8; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_r20 \
    $W48 \
    data.is_fixed_topology=true data.has_shared_features=true \
    data.use_node_features=true data.use_mask_as_node_feature=true \
    data.load_into_memory=true \
    trainer.max_epochs=800 trainer.epochs_per_run=100 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=25 \
    'check_methods=[none]' \
    output_dir=outputs/heat_r20_w48 \
    resume=outputs/heat_r20_w48/checkpoints
done

# 4) flagship parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  $W48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48

echo "=== QUEUE2 DONE $(date +%H:%M:%S)" >> "$LOG"
