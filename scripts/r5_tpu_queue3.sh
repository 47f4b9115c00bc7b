#!/bin/bash
# Round-5 TPU queue, phase 3 (restart after the queue2 session died at
# h2 epoch 79). Order = deliverable-risk order:
#   1) bunny continuation 599->800 (VERDICT r5 item 2; closest to done)
#   2) bunny benchmark CSV
#   3) h2 armadillo segments 79->399 (item 1, the long pole)
#   4) h2 checkpoint benchmark at ~e399 (decision signal for more segments)
# skip_test=true on intermediate segments (the per-segment test pass cost
# ~7.5 min each in queue1 without adding signal; infer is the real bench).
set -u
export PATH=/opt/venv/bin:$PATH   # jax lives in the venv, not system python
cd "$(dirname "$0")/.."
LOG=output/r5_queue3.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) bunny continuation to 800 (restart after the async-ckpt incident:
#    resuming from the repaired epoch_0639; 2 segments: 719, 799)
for i in 1 2; do
  [ -f output/r5_stop_bunny ] && break
  q timeout 3000 python -m tpu_spai.cli.train exp_name=heat_bunny \
    gnn_features=48 scheduler.params.gamma=0.9975 gnn.weight_init=torch \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=2000 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/heat_bunny_w48_cont \
    resume=outputs/heat_bunny_w48_cont/checkpoints
done

# 2) bunny benchmark at epoch 800
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/heat_bunny_w48_cont/checkpoints max_samples=4 \
  repeat=2 warmup=1 out_dir=output/heat_bunny_w48_cont

# 3) h2 armadillo segments 79 -> 399
for i in 1 2 3 4; do
  [ -f output/r5_stop_h2 ] && break
  q timeout 3000 python -m tpu_spai.cli.train exp_name=stretch_armadillo4_h2 \
    data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
    workspace=scaled gnn_features=48 gnn.weight_init=torch \
    scheduler.params.gamma=0.9975 \
    trainer.max_epochs=800 trainer.epochs_per_run=80 \
    trainer.check_val_every_n_epoch=40 checkpoint.every_n_epochs=40 \
    'check_methods=[none]' 'check_devices=[cpu]' skip_test=true \
    output_dir=outputs/stretch_armadillo4_h2b \
    resume=outputs/stretch_armadillo4_h2b/checkpoints
done

# 4) h2 checkpoint benchmark (~e399; 2 samples, 1 repeat = quick signal)
q timeout 5400 python -m tpu_spai.cli.infer exp_name=stretch_armadillo4_h2 \
  data.prefix=generated/stretch_armadillo4_h2 data.block_size=3 \
  workspace=scaled gnn_features=48 \
  'check_methods=[none,diagonal,fsai]' \
  pretrained=outputs/stretch_armadillo4_h2b/checkpoints max_samples=2 \
  repeat=1 warmup=1 out_dir=output/stretch_armadillo4_h2b_e399

echo "=== QUEUE3 DONE $(date +%H:%M:%S)" >> "$LOG"
