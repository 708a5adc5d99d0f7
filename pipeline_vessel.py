"""Vessel-segmentation experiment driver: TRAIN → TTA INFERENCE (AUC-ROC) →
ANALYSIS.

TPU-native equivalent of the reference ``pipeline_vessel.py`` (wired to
train_vessel / tta_vessel / stat_result_vessel, reference l.10-13,61-67):
DRIVE/CHASEDB1/HRF vessel masks, patch-trained models, ROC threshold search.
"""

import argparse
import json
import logging
from datetime import datetime

from eyediseasesegmentation_tpu.analysis.stat_result_vessel import export_result_vessel
from eyediseasesegmentation_tpu.config import BaseConfig, TestConfig
from eyediseasesegmentation_tpu.infer.tta import test_tta, tta_patches
from eyediseasesegmentation_tpu.train import train_model
from eyediseasesegmentation_tpu.utils import set_global_seed

logging.basicConfig(level=logging.INFO)
SEED = 1999

VESSEL_DEFAULTS = dict(
    dataset_name="DRIVE",
    lesion_type="Vessel_DRIVE",
    train_img_path="data/processed/DRIVE/train/image",
    train_mask_path="data/processed/DRIVE/train/mask",
    test_img_path="data/processed/DRIVE/test/image",
    test_mask_path="data/processed/DRIVE/test/mask",
    augmentation="advanced_vessel",
    scale_size=608,
    data_type="all",
)


def parse_arg():
    parse = argparse.ArgumentParser()
    parse.add_argument("--createprob", default="false", type=str)
    parse.add_argument("--optim_thres", default=0.0)
    parse.add_argument("--best", default="true", type=str)
    parse.add_argument("--tta", default="d4")
    parse.add_argument("--config", default=None, type=str)
    parse.add_argument("--exp_name", default=None, type=str)
    return vars(parse.parse_args())


def start_experiment(args):
    exp_name = args.get("exp_name") or datetime.now().strftime("%b%d_%H_%M")
    logging.info("Performing vessel experiment %s (SEED %d)", exp_name, SEED)
    set_global_seed(SEED)

    overrides = dict(VESSEL_DEFAULTS)
    if args.get("config"):
        with open(args["config"]) as f:
            overrides.update(json.load(f))

    configs = BaseConfig.from_dict({**BaseConfig().get_all_attributes(),
                                    **overrides}).get_all_attributes()

    logging.info("=== TRAINING (vessel) ===")
    logdir = train_model(exp_name, configs, SEED)

    logging.info("=== INFERENCE (TTA, AUC-ROC) ===")
    test_configs = TestConfig.from_dict({**TestConfig().get_all_attributes(),
                                         **overrides}).get_all_attributes()
    args = dict(args)
    if test_configs["data_type"] == "all":
        # whole vessel images are pre-padded squares: no resize
        # (reference tta_vessel.py:76)
        result = test_tta(logdir, test_configs, args, metric="roc",
                          resize=False)
    else:
        # vessel tiled inference reports the ROC curve family
        # (reference tta_vessel.py:206-218)
        result = tta_patches(logdir, test_configs, args, metric="roc")
    logging.info("inference result: %s", {k: v for k, v in result.items()
                                          if k != "out_dir"})

    logging.info("=== ANALYSIS ===")
    export_result_vessel(f"{test_configs['lesion_type']}/{exp_name}",
                         test_configs)
    logging.info("=== FINISH EXPERIMENT ===")
    return logdir, result


if __name__ == "__main__":
    start_experiment(parse_arg())
