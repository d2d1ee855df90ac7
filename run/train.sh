#!/usr/bin/env bash
# Train the unconditional scene diffusion model for one room type on TPU.
# Usage: run/train.sh [bedrooms|livingrooms|diningrooms] [out_dir]
set -euo pipefail
ROOM=${1:-bedrooms}
OUT=${2:-out}
python -m diffuscene_tpu.cli.train_diffusion \
    configs/uncond/diffusion_${ROOM}_instancond_lat32_v.yaml \
    "$OUT" --experiment_tag diffusion_${ROOM}_instancond_lat32_v
