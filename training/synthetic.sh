#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: synthetic"
python -m tpu_spai.cli.train \
    exp_name=synthetic \
    data.is_fixed_topology=false \
    data.has_shared_features=false \
    data.use_node_features=false \
    data.use_edge_features_as_node_feature=mean \
    "$@"
