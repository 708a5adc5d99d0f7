"""Multi-checkpoint ensemble inference CLI.

TPU-native equivalent of the reference root ``ensemble.py``: each run directory
contributes a model re-hydrated from its config.json + best checkpoint wrapped
in TTA; predictions are mean-merged on device, then AUC-PR + threshold search +
mask export run once on the ensemble probabilities (reference ensemble.py:64-141).

Usage:
    python ensemble.py --logdirs models/IDRiD/EX/run1 models/IDRiD/EX/run2 \
        --out outputs/ensemble --tta d4 [--config overrides.json]
"""

import argparse
import json
import logging

from eyediseasesegmentation_tpu.config import TestConfig
from eyediseasesegmentation_tpu.infer.ensemble import predict

logging.basicConfig(level=logging.INFO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdirs", nargs="+", required=True,
                        help="run directories (config.json + checkpoints/)")
    parser.add_argument("--out", default="outputs/ensemble")
    parser.add_argument("--tta", default="d4")
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--config", default=None,
                        help="json overriding TestConfig fields")
    parser.add_argument("--sharded", action="store_true",
                        help="evaluate members across the device mesh "
                             "(one chip per member, psum-mean)")
    args = parser.parse_args()

    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides = json.load(f)
    config = TestConfig.from_dict({**TestConfig().get_all_attributes(),
                                   **overrides}).get_all_attributes()
    mesh = None
    if args.sharded:
        from eyediseasesegmentation_tpu.parallel import make_mesh
        mesh = make_mesh()
    result = predict(config, args.logdirs, args.out, tta=args.tta,
                     batch_size=args.batch_size, mesh=mesh)
    logging.info("ensemble result: %s", result)


if __name__ == "__main__":
    main()
