#!/bin/bash
# rtol sweep around the infer benchmark (~ misc/infer_all_precision.sh):
# runs infer at each tolerance so plot_converge / tab_to_latex can sweep.
set -e
cd "$(dirname "$0")/.."
EXP=${EXP:-heat}
PREFIX=${PREFIX:-generated/$EXP}
CKPT=${CKPT:-outputs/$EXP/checkpoints}
for rtol in 1e-2 1e-4 1e-6 1e-8; do
    python -m tpu_spai.cli.infer \
        exp_name=$EXP data.prefix=$PREFIX pretrained=$CKPT \
        +rtol=$rtol "$@"
done
