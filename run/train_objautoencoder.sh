#!/usr/bin/env bash
# Train the KL shape autoencoder over bed+living+dining furniture.
set -euo pipefail
OUT=${1:-out}
PICKLE=${2:-data/threed_future_pc.pkl}
python -m diffuscene_tpu.cli.train_objautoencoder \
    configs/obj_autoencoder/bed_living_diningrooms_lat32.yaml \
    "$OUT" --path_to_pickled_dataset "$PICKLE"
