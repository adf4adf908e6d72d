#!/usr/bin/env bash
# Render movement for a trained model (reference scripts/zju_mocap/render_movement.sh).
SUBJECT=${1:-387}
EXTRA=""
if [ "movement" = "freeview" ]; then EXTRA="freeview.frame_idx ${2:-0}"; fi
CFG=humannerf_tpu/configs/zju_mocap/${SUBJECT}/adventure.yaml
if [ "zju_mocap" = "wild" ]; then CFG=humannerf_tpu/configs/wild/monocular/adventure.yaml; fi
python run.py --type movement --cfg $CFG load_net latest $EXTRA
