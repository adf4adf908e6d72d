#!/usr/bin/env bash
# Render movement for a trained model (reference scripts/wild/render_movement.sh).
SUBJECT=${1:-387}
EXTRA=""
if [ "movement" = "freeview" ]; then EXTRA="freeview.frame_idx ${2:-0}"; fi
CFG=humannerf_tpu/configs/wild/${SUBJECT}/adventure.yaml
if [ "wild" = "wild" ]; then CFG=humannerf_tpu/configs/wild/monocular/adventure.yaml; fi
python run.py --type movement --cfg $CFG load_net latest $EXTRA
