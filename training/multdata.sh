#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: multidata (remesh suite)"
python -m tpu_spai.cli.train --config-name=basic_multidata \
    exp_name=multdata \
    data.block_size=3 \
    "$@"
