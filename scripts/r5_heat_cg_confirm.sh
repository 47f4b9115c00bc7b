#!/bin/bash
# Waits for the heat_axes sweep to finish, then confirms the winning
# ConjGradLoss_ANorm variant at the 800-epoch scorecard budget.
set -u
export PATH=/opt/venv/bin:$PATH
cd "$(dirname "$0")/.."
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
nice -n 10 timeout 7200 python scripts/recipe_search.py menu=heat_cg_800 \
  families=heat_tetmesh epochs=800 workdir=/tmp/r5_heat_cg800 \
  out=r5_heat_cg800.json > output/r5_heat_cg800.log 2>&1
echo done >> output/r5_heat_cg800.log
