#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: stretch"
python -m tpu_spai.cli.train \
    exp_name=stretch \
    data.block_size=3 \
    "$@"
