"""Render / eval CLI (reference run.py).

  python run.py --type movement --cfg <experiment.yaml> [key value ...]
"""

import argparse

RUN_TYPES = ["movement", "freeview", "tpose", "tpose_pose_condition",
             "novelpose", "novelview", "novelview_all", "novelpose_eval",
             "train_render"]


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--type", required=True, choices=RUN_TYPES)
    ap.add_argument("--pose_id", type=int, default=-1)
    ap.add_argument("--test_num", type=int, default=-1)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    return ap.parse_args()


def main():
    args = parse_args()
    from humannerf_tpu import runtime
    runtime.setup()
    from humannerf_tpu.config import make_cfg
    cfg = make_cfg(args.cfg, args.opts)
    cfg.perturb = 0.0
    from humannerf_tpu.render import run
    run(cfg, args.type)


if __name__ == "__main__":
    main()
