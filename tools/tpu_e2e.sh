#!/bin/bash
# Real-TPU end-to-end pipeline run (VERDICT round-3 item 7): synthetic IDRiD
# data -> full pipeline.py drive (train -> x8-D4 TTA inference -> AUC-PR
# analysis + CSVs) with the FLAGSHIP UnetPlusPlusStar at 512^2, on the chip.
# Artifacts land under /tmp/eds_tpu_e2e/{models,outputs}/IDRiD/...
# Mirrors .claude/skills/verify/SKILL.md, scaled up from classic_unet@64.
set -x
WORK=/tmp/eds_tpu_e2e
rm -rf "$WORK" && mkdir -p "$WORK" && cd "$WORK" || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site

python - <<'EOF' || exit 1
from eyediseasesegmentation_tpu.data.synthetic import make_idrid_tree
make_idrid_tree("data", lesion_type="EX", n_train=8, n_test=4,
                size=(768, 768))
import json
json.dump({
    "train_img_path": "data/train/image",
    "train_mask_path": "data/train/mask",
    "test_img_path": "data/test/image",
    "test_mask_path": "data/test/label",
    "lesion_type": "EX", "scale_size": 512,
    "num_epochs": 2, "batch_size": 2, "is_fp16": True,
    "augmentation": "advanced",
    "model_name": "unetplusplusstar",
    "model_params": {"encoder_name": "BoTSER50_Axial_Imagenet_3",
                      "decoder_attention_type": "scse",
                      "base_dim": 16, "classes": 1,
                      "fast_inference": True, "fast_train": True},
    "criterion": {"bce": 0.8, "log_dice": 0.2}, "pos_weights": [5.0],
    "optimizer": "adamw", "learning_rate": 1e-4,
}, open("override.json", "w"))
EOF

python /root/repo/pipeline.py --tta d4 --config override.json \
    --exp_name tpu_e2e_r4 || exit 1

python /root/repo/evaluate.py --logdir models/IDRiD/EX/tpu_e2e_r4 \
    --config override.json || exit 1

echo "=== artifact tree ==="
find "$WORK/models" "$WORK/outputs" -type f | sort
