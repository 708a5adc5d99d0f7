#!/usr/bin/env bash
# Launch a SE lesion experiment for 5 epochs (reference script/SE_5ep.sh).
# On TPU there is no CUDA_VISIBLE_DEVICES: the mesh uses all local chips.
set -e
cd "$(dirname "$0")/.."
cat > /tmp/eds_SE_5.json <<JSON
{"lesion_type": "SE", "num_epochs": 5}
JSON
python pipeline.py --tta d4 --best true --config /tmp/eds_SE_5.json
