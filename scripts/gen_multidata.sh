#!/bin/bash
# Generate the multidata/remesh twist suite (~ reference data/objs/gen-remesh.sh
# + per-resolution elast_twist datasets referenced by basic_multidata.yaml):
# four structured resolutions r8-r14 and four "remesh" variants (perturbed
# meshes standing in for tetgen accuracy sweeps in this zero-egress env).
set -e
cd "$(dirname "$0")/.."
COUNT=${COUNT:-32}

for r in 8 10 12 14; do
    python -m tpu_spai.datagen.elasticity \
        prefix=generated/elast_twist_r$r resolution=$r nx=4 \
        max_count=$COUNT "$@"
done

i=0
for acc in 1e-3 1e-4 3e-3 3e-4; do
    i=$((i+1))
    python -m tpu_spai.datagen.elasticity \
        prefix=generated/twist-tiny-box-remesh-$acc \
        resolution=$((6 + 2*i)) nx=2 seed=$((100+i)) \
        max_count=$COUNT "$@"
done
echo "multidata suite generated under generated/"
