#!/usr/bin/env bash
# Evaluate a checkpoint (mirror of the reference eval.sh API).
set -e
CONFIG=${1:-configs/prototypes/SegDINO3D_ScanNet200.py}
WORK_DIR=${2:-work_dirs/segdino3d_scannet200}
shift 2 || true
python train_3d.py \
  --config_file "$CONFIG" \
  --work_dir "$WORK_DIR" \
  --eval_only --resume \
  "$@"
