#!/usr/bin/env bash
# Stage 3 — frozen-backbone baseline fine-tune.
# Equivalent of train_run_baseline.sh (1xH100, 12 h) on a TPU slice:
# mesh.fsdp expands to all local chips by default (mesh.fsdp=-1).
set -euo pipefail
SUBJECT=${1:?usage: train_baseline.sh <sub-XX> [extra overrides...]}
shift || true
export SCRATCH_PATH=${SCRATCH_PATH:-/data/lazyload}
export TRANSFORMERS_OFFLINE=1

python -m phantom_vlb_tpu.cli.train \
  experiment=vlb_friends_baseline "subject=$SUBJECT" \
  "model.checkpoint_path=${CKPT:-/data/models/VideoLLaMA2-7B}" "$@"
