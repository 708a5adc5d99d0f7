#!/usr/bin/env bash
# Launch a HE lesion experiment for 20 epochs (reference script/HE_20ep.sh).
# On TPU there is no CUDA_VISIBLE_DEVICES: the mesh uses all local chips.
set -e
cd "$(dirname "$0")/.."
cat > /tmp/eds_HE_20.json <<JSON
{"lesion_type": "HE", "num_epochs": 20}
JSON
python pipeline.py --tta d4 --best true --config /tmp/eds_HE_20.json
