"""Train CLI (reference train.py).

  python train.py --cfg humannerf_tpu/configs/zju_mocap/387/adventure.yaml \
      [key value ...]
"""

import argparse

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return ap.parse_args()


def main():
    args = parse_args()
    from humannerf_tpu import runtime
    runtime.setup()
    from humannerf_tpu.config import make_cfg
    cfg = make_cfg(args.cfg, args.opts)
    np.random.seed(cfg.random_seed)

    import os
    os.makedirs(cfg.logdir, exist_ok=True)
    from humannerf_tpu.utils.log import Logger
    logger = Logger(cfg.logdir)
    logger.print_config(cfg)

    from humannerf_tpu.train.trainer import Trainer
    trainer = Trainer(cfg, log=logger)
    try:
        trainer.train()
    finally:
        trainer.finalize()


if __name__ == "__main__":
    main()
