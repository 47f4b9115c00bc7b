#!/bin/bash
# Round-4 TPU queue, phase 1 (VERDICT r3 item 1): validate the
# width-aware fused-kernel VMEM fix on the chip, then regenerate the
# w48 benchmark CSVs so the FSAI-parity models own the device rows
# (NeuralSlot+TPU with honest fused construction).
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue1.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) kernel gate (verify-skill requirement after touching gnn/slotted*;
#    now includes the w48 fused case)
q timeout 1800 python scripts/tpu_kernel_gate.py

# 2) flagship w48 parity rows (epoch_0239 via repointed latest.json)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  gnn_features=48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48

# 3) bunny w48 parity rows (epoch_0479 via repointed latest.json)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_bunny_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_bunny_w48

echo "=== QUEUE1 DONE $(date +%H:%M:%S)" >> "$LOG"
