#!/usr/bin/env bash
# Train on a ZJU-MoCap subject.
SUBJECT=${1:-387}
python train.py --cfg humannerf_tpu/configs/zju_mocap/${SUBJECT}/adventure.yaml
