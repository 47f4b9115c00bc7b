#!/bin/bash
# Shared launcher prologue for the canonical experiments (~ reference
# training/*.sh). All scripts forward extra CLI args to the trainer.
set -e
cd "$(dirname "$0")/.."
echo ">>> PYTHON=$(which python)"
echo ">>> ARGS=$@"
