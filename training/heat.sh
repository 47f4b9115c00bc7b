#!/bin/bash
source "$(dirname "$0")/common.sh"
echo "TRAIN: heat"
python -m tpu_spai.cli.train exp_name=heat "$@"
