#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: elast_twist"
python -m tpu_spai.cli.train \
    exp_name=elast_twist \
    data.block_size=3 \
    "$@"
