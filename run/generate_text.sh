#!/usr/bin/env bash
# Text-conditioned generation: descriptions from the eval split condition the
# sampler (reference: run/generate_text.sh, batch-1 loop; here jitted batches
# with the fused serving engine).
set -euo pipefail
ROOM=${1:-bedrooms}
WEIGHTS=${2:-out/diffusion_${ROOM}_text}
OUT=${3:-generated_text/${ROOM}}
python -m diffuscene_tpu.cli.generate_diffusion \
    configs/text/diffusion_${ROOM}_instancond_lat32_v_bert.yaml \
    "$OUT" --weight_file "$WEIGHTS" \
    --n_sequences 1000 --batch_size 256 --clip_denoised --fused \
    --render --compute_intersec
