#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: heat_tetmesh"
python -m tpu_spai.cli.train \
    exp_name=heat_tetmesh \
    data.is_fixed_topology=false \
    data.has_shared_features=false \
    "$@"
