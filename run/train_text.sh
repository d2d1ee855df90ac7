#!/usr/bin/env bash
# Train the text-conditioned model (precomputed BERT/GloVe embeddings).
set -euo pipefail
ROOM=${1:-bedrooms}
OUT=${2:-out}
python -m diffuscene_tpu.cli.train_diffusion \
    configs/text/diffusion_${ROOM}_instancond_lat32_v_bert.yaml \
    "$OUT" --experiment_tag diffusion_${ROOM}_text
