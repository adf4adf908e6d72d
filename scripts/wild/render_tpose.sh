#!/usr/bin/env bash
# Render tpose for a trained model (reference scripts/wild/render_tpose.sh).
SUBJECT=${1:-387}
EXTRA=""
if [ "tpose" = "freeview" ]; then EXTRA="freeview.frame_idx ${2:-0}"; fi
CFG=humannerf_tpu/configs/wild/${SUBJECT}/adventure.yaml
if [ "wild" = "wild" ]; then CFG=humannerf_tpu/configs/wild/monocular/adventure.yaml; fi
python run.py --type tpose --cfg $CFG load_net latest $EXTRA
