#!/bin/bash
# epsilon sweep (~ misc/infer_all_precision_epsilon.sh): overrides the SPAI
# regularizer at inference time (infer_prefix distinguishes outputs).
set -e
cd "$(dirname "$0")/.."
EXP=${EXP:-heat}
PREFIX=${PREFIX:-generated/$EXP}
CKPT=${CKPT:-outputs/$EXP/checkpoints}
for eps in 3e-5 1e-4 3e-4 1e-3 3e-3 1e-2 3e-2; do
    python -m tpu_spai.cli.infer \
        exp_name=$EXP data.prefix=$PREFIX pretrained=$CKPT \
        +override_epsilon=$eps +infer_prefix=eps${eps}_ "$@"
done
