#!/usr/bin/env bash
# Train the re-arrangement model (translation+angle diffusion only).
set -euo pipefail
ROOM=${1:-bedrooms}
OUT=${2:-out}
python -m diffuscene_tpu.cli.train_diffusion \
    configs/rearrange/diffusion_${ROOM}_instancond_lat32_v_rearrange.yaml \
    "$OUT" --experiment_tag diffusion_${ROOM}_rearrange
