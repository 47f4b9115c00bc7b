#!/bin/bash
# epsilon override sweep at rtol=1e-8
# (~ misc/infer_all_precision_epsilon_override.sh): re-solves with the
# trained factor but overridden preconditioner epsilon.
set -e
cd "$(dirname "$0")/.."
EXP=${1:?usage: infer_all_precision_epsilon_override.sh EXP CKPT [extra]}
CKPT=${2:?usage: ...}
for epsilon in 1e-6 1e-4 1e-2 1e-1; do
    python -m tpu_spai.cli.infer \
        exp_name="$EXP" pretrained="$CKPT" \
        +out_dir=output/epsilon_$epsilon +rtol=1e-8 \
        +override_epsilon=$epsilon "${@:3}"
done
