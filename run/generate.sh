#!/usr/bin/env bash
# Batched 1000-step DDPM sampling + renders + metrics.
# (Reference: run/generate.sh with n_sequences 1000 at batch 1; here the
#  whole sweep runs in jitted batches on the TPU.)
set -euo pipefail
ROOM=${1:-bedrooms}
WEIGHTS=${2:-out/diffusion_${ROOM}_instancond_lat32_v}
OUT=${3:-generated/${ROOM}}
python -m diffuscene_tpu.cli.generate_diffusion \
    configs/uncond/diffusion_${ROOM}_instancond_lat32_v.yaml \
    "$OUT" --weight_file "$WEIGHTS" \
    --n_sequences 1000 --batch_size 256 --clip_denoised --fused \
    --render --compute_intersec
