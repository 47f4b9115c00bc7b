#!/bin/bash
# Round-2 TPU job queue — strictly serialized (ONE process on the TPU at
# a time, CLAUDE.md env rules). Runs the ds-tier study on the real chip,
# then trains + benchmarks the reference's real geometries (VERDICT
# round-2 item 5): heat on bunny_low_res, poisson on pipe_high_res.
set -u
cd "$(dirname "$0")/.."
LOG=output/r2_queue.log
mkdir -p output
q() {
  echo "=== $(date +%H:%M:%S) $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S)" >> "$LOG"
}

# 1) ds-tier iteration/wall study on the real chip (XLA:CPU collapses the
#    double-single transforms, so only on-TPU numbers are meaningful)
q timeout 2700 python scripts/rds_study.py tpu=1 max_samples=2 \
  out=output/rds_study_tpu.csv

# 2) heat_bunny: reference geometry (datagen/heat.py:46-47), 300 epochs
#    in 50-epoch segments (relay RSS leak)
for i in 1 2 3 4 5 6; do
  q timeout 2400 python -m tpu_spai.cli.train exp_name=heat_bunny \
    trainer.max_epochs=300 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=50 \
    'check_methods=[none]' \
    output_dir=outputs/heat_bunny resume=outputs/heat_bunny/checkpoints
done

# 3) bunny parity rows through the production benchmark CLI
q timeout 3600 python -m tpu_spai.cli.infer exp_name=heat_bunny \
  'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/heat_bunny/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/heat_bunny

# 4) poisson_pipe: reference geometry (datagen/poisson.py:48-55), 200 epochs
for i in 1 2 3 4; do
  q timeout 3000 python -m tpu_spai.cli.train exp_name=poisson_pipe \
    data.use_node_features=false \
    trainer.max_epochs=200 trainer.epochs_per_run=50 \
    trainer.check_val_every_n_epoch=100 checkpoint.every_n_epochs=50 \
    'check_methods=[none]' \
    output_dir=outputs/poisson_pipe resume=outputs/poisson_pipe/checkpoints
done

# 5) pipe parity rows
q timeout 3600 python -m tpu_spai.cli.infer exp_name=poisson_pipe \
  data.use_node_features=false 'check_methods=[none,diagonal,ainv,ic,fsai]' \
  pretrained=outputs/poisson_pipe/checkpoints max_samples=4 repeat=2 \
  warmup=1 out_dir=output/poisson_pipe

echo "=== QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
