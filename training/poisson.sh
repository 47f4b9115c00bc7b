#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: poisson"
python -m tpu_spai.cli.train \
    exp_name=poisson \
    data.use_node_features=false \
    "$@"
