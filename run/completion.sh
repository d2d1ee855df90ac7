#!/usr/bin/env bash
# Scene completion from partial scenes (RePaint-style splice sampling).
set -euo pipefail
ROOM=${1:-bedrooms}
WEIGHTS=${2:-out/diffusion_${ROOM}_instancond_lat32_v}
OUT=${3:-completed/${ROOM}}
python -m diffuscene_tpu.cli.completion_rearrange \
    configs/uncond/diffusion_${ROOM}_instancond_lat32_v.yaml \
    "$OUT" --weight_file "$WEIGHTS" --num_partial 3 \
    --n_sequences 100 --batch_size 32 --clip_denoised --fused --render
