#!/bin/bash
# Round-4 TPU queue, phase 5 (reprioritized tail): critical benchmark
# refreshes FIRST (w48 CSV with the gsel expansion + scalar-fetch
# timing, kernel gate, step profile re-run, bench rehearsal), then as
# many bunny continuation segments as the clock allows.
set -u
cd "$(dirname "$0")/.."
LOG=output/r4_queue5.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# serialize behind the still-running armadillo benchmark (pid in $1)
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1) refreshed flagship w48 CSV
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_r20 \
  gnn_features=48 \
  data.is_fixed_topology=true data.has_shared_features=true \
  data.use_node_features=true data.use_mask_as_node_feature=true \
  data.load_into_memory=true \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_r20_w48/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_r20_w48

# 2) kernel gate (application-level w48 referee + ds changes)
q timeout 1800 python scripts/tpu_kernel_gate.py

# 3) bench rehearsal
q timeout 1800 python bench.py

# 4) step profile re-run (grad chain DCE fix)
q timeout 2400 python scripts/r4_step_profile.py

# 5) bunny continuation segments (as many as fit before round end;
#    checkpoints make partial progress durable for round 5)
for i in 1 2 3 4; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' \
    output_dir=outputs/heat_bunny_w48_cont \
    resume=outputs/heat_bunny_w48_cont/checkpoints
done

# 6) bunny continuation benchmark (whatever epoch was reached)
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/heat_bunny_w48_cont/checkpoints max_samples=4 \
  repeat=2 warmup=1 out_dir=output/heat_bunny_w48_cont

echo "=== QUEUE5 DONE $(date +%H:%M:%S)" >> "$LOG"
