"""Lesion-segmentation experiment driver: TRAIN → TTA INFERENCE → ANALYSIS.

TPU-native equivalent of the reference ``pipeline.py``: same CLI flags
(--createprob / --optim_thres / --best / --tta, reference pipeline.py:17-27),
same artifact tree (checkpoints + config.json under
``models/<dataset>/<lesion>/<MonDD_HH_MM>/``; masks, figures and CSVs under
``outputs/``), same SEED=1999 discipline (pipeline.py:36-40) — with training,
TTA and the threshold sweep compiled onto the TPU.
"""

import argparse
import dataclasses
import json
import logging
from datetime import datetime

from eyediseasesegmentation_tpu.analysis.stat_result import export_result
from eyediseasesegmentation_tpu.config import BaseConfig, TestConfig
from eyediseasesegmentation_tpu.infer.tta import test_tta, tta_patches
from eyediseasesegmentation_tpu.train import train_model
from eyediseasesegmentation_tpu.utils import set_global_seed

logging.basicConfig(level=logging.INFO)
SEED = 1999


def parse_arg():
    parse = argparse.ArgumentParser()
    parse.add_argument("--createprob", default="false", type=str,
                       help="Also save probability masks, not only binary")
    parse.add_argument("--optim_thres", default=0.0,
                       help="Optimal threshold obtained from the AUC-PR curve")
    parse.add_argument("--best", default="true", type=str,
                       help="Use best checkpoint (true) or last (false)")
    parse.add_argument("--tta", default="d4",
                       help="TTA alias: d4, multiscale, flip, hflip, five_crop, "
                            "ten_crop, none")
    parse.add_argument("--config", default=None, type=str,
                       help="Optional json file overriding BaseConfig fields")
    parse.add_argument("--exp_name", default=None, type=str,
                       help="Pin the experiment name (default: timestamp)")
    return vars(parse.parse_args())


def start_experiment(args):
    exp_name = args.get("exp_name") or datetime.now().strftime("%b%d_%H_%M")
    logging.info("Performing experiment %s (SEED %d)", exp_name, SEED)
    set_global_seed(SEED)

    overrides = {}
    if args.get("config"):
        with open(args["config"]) as f:
            overrides = json.load(f)

    configs = BaseConfig.from_dict({**BaseConfig().get_all_attributes(),
                                    **overrides}).get_all_attributes()

    logging.info("=== TRAINING ===")
    logdir = train_model(exp_name, configs, SEED)

    logging.info("=== INFERENCE (TTA) ===")
    test_configs = TestConfig.from_dict({**TestConfig().get_all_attributes(),
                                         **overrides}).get_all_attributes()
    args = dict(args)
    args["createprob"] = "true"
    if test_configs["data_type"] == "all":
        result = test_tta(logdir, test_configs, args)
    else:
        result = tta_patches(logdir, test_configs, args)
    logging.info("inference result: %s", {k: v for k, v in result.items()
                                          if k != "out_dir"})

    logging.info("=== ANALYSIS ===")
    export_result(f"{test_configs['lesion_type']}/{exp_name}", test_configs)
    logging.info("=== FINISH EXPERIMENT ===")
    return logdir, result


if __name__ == "__main__":
    start_experiment(parse_arg())
