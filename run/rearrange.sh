#!/usr/bin/env bash
# Scene re-arrangement: denoise translations/angles of a noisy scene.
set -euo pipefail
ROOM=${1:-bedrooms}
WEIGHTS=${2:-out/diffusion_${ROOM}_rearrange}
OUT=${3:-rearranged/${ROOM}}
python -m diffuscene_tpu.cli.completion_rearrange \
    configs/rearrange/diffusion_${ROOM}_instancond_lat32_v_rearrange.yaml \
    "$OUT" --weight_file "$WEIGHTS" --arrange_objects \
    --n_sequences 100 --batch_size 32 --clip_denoised --fused --render
