#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: poisson_tetmesh"
python -m tpu_spai.cli.train \
    exp_name=poisson3d \
    data.is_fixed_topology=false \
    data.has_shared_features=false \
    "$@"
