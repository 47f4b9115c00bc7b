#!/bin/bash
# rtol sweep for the multidata (8-dataset twist) configuration
# (~ misc/infer_all_precision_multidata.sh): block_size=3, composed from
# configs/basic_multidata.yaml.
set -e
cd "$(dirname "$0")/.."
EXP=${1:?usage: infer_all_precision_multidata.sh EXP CKPT [extra overrides]}
CKPT=${2:?usage: infer_all_precision_multidata.sh EXP CKPT [extra overrides]}
for rtol in 1e-8; do
    python -m tpu_spai.cli.infer --config-name=basic_multidata \
        data.block_size=3 exp_name="$EXP" pretrained="$CKPT" \
        +rtol=$rtol "${@:3}"
done
